package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.ops._
import graft.model.Telemetry.SnapshotRef

class DynamicFilterSpec extends SparkSpec {
  import DynamicFilter._

  test("all-absent sentinel args yield pass-through predicate") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("x", "s")
    val cond = conjunct(eqArg(col("x"), -1), eqArg(col("s"), ""), geArg(col("x"), -1L))
    assert(df.where(cond).count() === 2)
  }

  test("present args AND together") {
    import spark.implicits._
    val df = Seq((1, "a", 5L), (2, "a", 9L), (2, "b", 9L)).toDF("x", "s", "t")
    val cond = conjunct(eqArg(col("x"), 2), eqArg(col("s"), "a"), leArg(col("t"), 10L))
    assert(df.where(cond).collect().map(_.getInt(0)).toSeq === Seq(2))
  }

  test("every subset of present args matches naive filtering") {
    import spark.implicits._
    val rows = for (x <- 1 to 3; y <- 1 to 3) yield (x, y)
    val df = rows.toDF("x", "y")
    for (xa <- Seq(-1, 2); ya <- Seq(-1, 3)) {
      val got = df.where(conjunct(eqArg(col("x"), xa), eqArg(col("y"), ya))).count()
      val want = rows.count(r => (xa == -1 || r._1 == xa) && (ya == -1 || r._2 == ya))
      assert(got === want, s"xa=$xa ya=$ya")
    }
  }
}

class ArgmaxLatestSpec extends SparkSpec {

  test("max_by argmax, window argmax and naive scala agree") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, "v1"), ("a", 3L, "v3"), ("a", 2L, "v2"),
      ("b", 7L, "w7"), ("b", 5L, "w5"), ("c", 1L, "x1"))
    val df = rows.toDF("k", "ord", "payload")
    val naive = rows.groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2)._3 }
    val viaAgg = ArgmaxLatest.latestRows(df, Seq("k"), col("ord"))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    val viaWin = ArgmaxLatest.latestRowsWindow(df, Seq("k"), Seq(col("ord")))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(viaAgg === naive)
    assert(viaWin === naive)
  }

  test("struct ord breaks ties deterministically") {
    import spark.implicits._
    val df = Seq(("a", 1L, 9L, "lo"), ("a", 1L, 10L, "hi")).toDF("k", "ord", "tie", "p")
    val got = ArgmaxLatest.latestRows(df, Seq("k"), struct(col("ord"), col("tie")))
      .collect().head.getString(3)
    assert(got === "hi")
  }

  test("topK keeps k rows per key in order") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("k", i.toLong)).toDF("k", "ord")
    val got = ArgmaxLatest.topKPerKey(df, Seq("k"), Seq(col("ord")), 3)
      .collect().map(_.getLong(1)).sorted
    assert(got.toSeq === Seq(8L, 9L, 10L))
  }
}

class LocfSpec extends SparkSpec {

  test("forward-fills nulls per key in order, leading nulls stay") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Some(10L)), ("a", 2L, None), ("a", 3L, Some(30L)), ("a", 4L, None),
      ("b", 1L, None), ("b", 2L, Some(5L)))
      .toDF("k", "t", "v")
    val got = Locf.fill(df, Seq("k"), Seq(col("t")), Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(("a", 2L)) === Some(10L))
    assert(got(("a", 4L)) === Some(30L))
    assert(got(("b", 1L)) === None)
    assert(got(("b", 2L)) === Some(5L))
  }
}

class ArgsTableSpec extends SparkSpec {

  test("parses reference list format incl. single element") {
    assert(ArgsTable.parseList("(1),(2),(3)") === Seq("1", "2", "3"))
    assert(ArgsTable.parseList("(42)") === Seq("42"))
    assert(ArgsTable.parseList("") === Seq())
    assert(ArgsTable.parseList("(a), (b)") === Seq("a", "b"))
  }

  test("only the wrapping paren pair is stripped — inner parens survive") {
    assert(ArgsTable.parseListKeepEmpty("((value+1)*2>5),()") ===
      Seq("(value+1)*2>5", ""))
    assert(ArgsTable.parseListKeepEmpty("(f(x)>1),(a (b) c)") ===
      Seq("f(x)>1", "a (b) c"))
  }

  test("expand produces the deduplicated cross product") {
    val df = ArgsTable.expand(spark, "(1),(2),(1)", "(x),(y)")
    assert(df.count() === 4)
  }

  test("zip keeps empty () elements so positions stay aligned") {
    val df = ArgsTable.zip(spark.asInstanceOf[org.apache.spark.sql.SparkSession], Seq(
      "f" -> "(1),(2),(3)", "filter" -> "(),(value>5),()"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("1", ""), ("2", "value>5"), ("3", "")))
  }

  test("zip joins lists positionally, truncating to shortest") {
    val df = ArgsTable.zip(spark, Seq("f" -> "(1),(2),(3)", "s" -> "(a),(b)"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("1", "a"), ("2", "b")))
  }
}

class AsOfJoinSpec extends SparkSpec {

  test("each left row gets the latest right value at-or-before its time") {
    import spark.implicits._
    val left = Seq((1L, "k1", 10L), (2L, "k1", 25L), (3L, "k1", 5L), (4L, "k2", 50L))
      .toDF("id", "k", "t")
    val right = Seq(("k1", 10L, 100.0), ("k1", 20L, 200.0), ("k2", 60L, 300.0))
      .toDF("k", "t", "v")
    val got = graft.ops.AsOfJoin.asOf(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("v"))).toMap
    assert(got(1L) === Some(100.0)) // inclusive: right at t=10 matches left t=10
    assert(got(2L) === Some(200.0)) // latest ≤ 25
    assert(got(3L) === None)        // nothing at or before t=5
    assert(got(4L) === None)        // k2's only right row is after t=50
  }

  test("right rows with a null time never match (no nulls-first bleed)") {
    import spark.implicits._
    val left = Seq((1L, "k1", 5L)).toDF("id", "k", "t")
    val right = Seq(("k1", Option.empty[Long], 99.0), ("k1", Some(4L), 7.0))
      .toDF("k", "t", "v")
    val got = graft.ops.AsOfJoin.asOf(left, right, Seq("k"), "t", Seq("v"))
      .head().getAs[Double]("v")
    assert(got === 7.0) // the null-time 99.0 row is invisible
  }

  test("valueCols colliding with left columns are rejected") {
    import spark.implicits._
    val df = Seq((1L, "k", 1L, 9.0)).toDF("id", "k", "t", "v")
    intercept[IllegalArgumentException] {
      graft.ops.AsOfJoin.asOf(df, df, Seq("k"), "t", Seq("v"))
    }
  }
}

class RangeJoinSpec extends SparkSpec {

  test("containment is exact and inclusive across bin boundaries") {
    import spark.implicits._
    val iv = Seq(("k1", 10L, 30L), ("k2", 100L, 100L)).toDF("k", "lo", "hi")
    val pt = Seq(("k1", 9L), ("k1", 10L), ("k1", 25L), ("k1", 30L), ("k1", 31L),
      ("k2", 100L), ("k2", 101L)).toDF("k", "t")
    val got = graft.ops.RangeJoin.intervalPoint(iv, pt, Seq("k"), "lo", "hi", "t", 8L)
      .select("k", "t").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("k1", 10L), ("k1", 25L), ("k1", 30L), ("k2", 100L)))
  }

  test("plan is an equijoin on (key, bin) — no nested-loop/cartesian") {
    import spark.implicits._
    val iv = Seq(("k1", 10L, 30L)).toDF("k", "lo", "hi")
    val pt = Seq(("k1", 9L)).toDF("k", "t")
    val plan = graft.ops.RangeJoin.intervalPoint(iv, pt, Seq("k"), "lo", "hi", "t", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}

class TableLoaderSpec extends SparkSpec {

  test("replay mode picks the *_replay pair; online the base pair") {
    import spark.implicits._
    val base = Seq((1, "base")).toDF("id", "tag")
    val replay = Seq((1, "replay")).toDF("id", "tag")
    val loader = new graft.io.MapLoader(Map(
      "instance_field" -> base, "instance_field_replay" -> replay,
      "instance_message" -> base, "instance_message_replay" -> replay))
    assert(loader.instanceField(graft.io.Online).head().getString(1) === "base")
    assert(loader.instanceField(graft.io.Replay).head().getString(1) === "replay")
    assert(loader.instanceMessage(graft.io.Replay).head().getString(1) === "replay")
  }

  test("DataSourceLoader binds any connector format behind the seam") {
    import spark.implicits._
    // stand-in connector: the parquet source driven through the SAME
    // format+options path a Cassandra connector jar would use
    val dir = graft.WorkDirs.acquire("test_graft_dsl").toString
    try {
      Seq((1, "base")).toDF("id", "tag")
        .write.parquet(s"$dir/instance_field.parquet")
      Seq((1, "replay")).toDF("id", "tag")
        .write.parquet(s"$dir/instance_field_replay.parquet")
      val loader = new graft.io.DataSourceLoader(spark, "parquet",
        name => Map("path" -> s"$dir/$name.parquet"))
      assert(loader.table("instance_field").head().getString(1) === "base")
      assert(loader.instanceField(graft.io.Replay).head().getString(1) === "replay")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    // the Cassandra binding resolves table -> {keyspace, table} options and
    // the connector format; the read fails only at connector lookup (no
    // jar in this environment), i.e. AFTER the seam did its job
    val cass = graft.io.DataSourceLoader.cassandra(spark, "telemetry")
    val err = intercept[Exception](cass.table("instance_field"))
    assert(err.getMessage.contains("cassandra") ||
      err.getCause != null && err.getCause.getMessage.contains("cassandra"))
  }

  test("FixtureSource: the seam drives a real DataSource V2 connector end-to-end") {
    import spark.implicits._
    graft.io.v2.FixtureCatalog.register("instance_field",
      Seq((1, 10L, "a"), (2, 20L, "b"), (3, 30L, "c"))
        .toDF("id", "value", "tag"))
    graft.io.v2.FixtureCatalog.register("instance_field_replay",
      Seq((9, 90L, "r")).toDF("id", "value", "tag"))
    try {
      // same format+options binding shape as DataSourceLoader.cassandra
      val loader = new graft.io.DataSourceLoader(spark,
        "graft.io.v2.FixtureSource", name => Map("table" -> name))
      assert(loader.table("instance_field").count() === 3)
      assert(loader.instanceField(graft.io.Replay)
        .head().getString(2) === "r")
      // content parity through the full V2 read path
      val got = loader.table("instance_field").orderBy("id")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
      assert(got.toSeq === Seq((1, 10L, "a"), (2, 20L, "b"), (3, 30L, "c")))
    } finally graft.io.v2.FixtureCatalog.clear()
  }

  test("FixtureSource: filters push into the scan and columns prune") {
    import spark.implicits._
    graft.io.v2.FixtureCatalog.register("pushdown_probe",
      Seq((1, 10L, "a"), (2, 20L, "b"), (3, 30L, "c"), (4, 40L, "d"))
        .toDF("id", "value", "tag"))
    try {
      val df = spark.read.format("graft.io.v2.FixtureSource")
        .option("table", "pushdown_probe").load()
        .where(col("value") > 15L).select("id")
      assert(df.collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3, 4))
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[graft.io.v2.FixtureScan]
      }
      assert(scans.nonEmpty)
      val scan = scans.head
      // the comparison pushed INTO the connector...
      assert(scan.pushed.exists {
        case org.apache.spark.sql.sources.GreaterThan("value", 15L) => true
        case _ => false
      })
      // ...and the read schema narrowed to what the query needs: `value`
      // is consumed by the pushed predicate, `tag` by nobody — neither
      // crosses the scan boundary
      assert(scan.readSchema().fieldNames.toSeq === Seq("id"))
    } finally graft.io.v2.FixtureCatalog.clear()
  }

  test("FixtureSource: pushed long comparisons are exact above 2^53") {
    import spark.implicits._
    // adjacent longs that collapse to the SAME double — a doubleValue
    // compare would match both rows and Spark never re-checks pushed
    // filters, so the connector must compare integrals as longs
    val a = 9007199254740993L // 2^53 + 1
    val b = 9007199254740992L // 2^53
    graft.io.v2.FixtureCatalog.register("big_longs",
      Seq((1, a), (2, b)).toDF("id", "value"))
    try {
      def ids(v: Long) = spark.read.format("graft.io.v2.FixtureSource")
        .option("table", "big_longs").load()
        .where(col("value") === v).collect().map(_.getInt(0)).toSeq
      assert(ids(a) === Seq(1))
      assert(ids(b) === Seq(2))
    } finally graft.io.v2.FixtureCatalog.clear()
  }

  test("FixtureSource: unsupported predicates stay residual, still correct") {
    import spark.implicits._
    graft.io.v2.FixtureCatalog.register("residual_probe",
      Seq((1, "apple"), (2, "banana"), (3, "cherry")).toDF("id", "tag"))
    try {
      // EndsWith is not in the connector's supported set -> Spark must
      // evaluate it post-scan; the result is correct either way
      val df = spark.read.format("graft.io.v2.FixtureSource")
        .option("table", "residual_probe").load()
        .where(col("tag").endsWith("y") || col("id") === 1)
      assert(df.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 3))
      val scan = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[graft.io.v2.FixtureScan]
      }.head
      // the OR-of-mixed-support predicate cannot push as a whole
      assert(!scan.pushed.exists(_.references.contains("tag")))
    } finally graft.io.v2.FixtureCatalog.clear()
  }

  test("activated() gates on the mode's participation flag") {
    import spark.implicits._
    val cat = Seq((1, true, false), (2, false, true), (3, true, true))
      .toDF("id", "playback_activated", "online_activated")
    def ids(m: graft.io.AcquisitionMode) =
      graft.io.AcquisitionMode.activated(cat, m).collect().map(_.getInt(0)).toSet
    assert(ids(graft.io.Replay) === Set(1, 3))
    assert(ids(graft.io.Online) === Set(2, 3))
  }

  test("delta-log layout: hive partitions by message type, id slice prunes") {
    val dir = graft.WorkDirs.acquire("test_graft_layout").toString
    try {
      graft.io.TableWriter.writeDeltaLog(Fixtures.instanceField(spark), dir)
      // hive partition directories exist per message type
      val parts = new java.io.File(dir).list().filter(_.startsWith("uevol_message_id="))
      assert(parts.toSeq === Seq(s"uevol_message_id=${Fixtures.MsgType}"))
      // a typed slice shows partition pruning + pushed row-group range
      val plan = spark.read.parquet(dir)
        .where(col("uevol_message_id") === Fixtures.MsgType &&
          col("instance_message_id").between(100L, 150L))
        .queryExecution.executedPlan.toString
      // (the explain string truncates long filter lists — assert on the
      // head of each list, which carries the load-bearing bound)
      assert(plan.contains(s"PartitionFilters: [isnotnull(uevol_message_id"))
      assert(plan.contains(s"uevol_message_id#") &&
        plan.contains(s"= ${Fixtures.MsgType})"))
      assert(plan.contains("GreaterThanOrEqual(instance_message_id,100)"))
      // the slice returns exactly the in-range rows
      val n = spark.read.parquet(dir)
        .where(col("instance_message_id").between(100L, 150L)).count()
      assert(n === 4) // updates at 110, 115, 120, 130
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("shard writer: md5-stable shard dirs, rerun-identical assignment") {
    import spark.implicits._
    val dir = graft.WorkDirs.acquire("test_graft_shards").toString
    try {
      val df = (1L to 200L).map(i => (i, s"seq_$i")).toDF("seq_id", "payload")
      graft.io.TableWriter.writeShards(df, dir, "seq_id", nShards = 4,
        sortCols = Seq("seq_id"))
      val parts = new java.io.File(dir).list().filter(_.startsWith("shard=")).sorted
      assert(parts.toSeq === Seq("shard=0", "shard=1", "shard=2", "shard=3"))
      val back = spark.read.parquet(dir)
      assert(back.count() === 200)
      // assignment replays Sampling.hashValue — stable across runs/engines
      val got = back.select("seq_id", "shard").collect()
        .map(r => r.getLong(0) -> r.getAs[Number]("shard").longValue).toMap
      def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (1L to 200L).foreach { i =>
        val hv = java.lang.Long.parseLong(md5hex(i.toString).substring(0, 8), 16)
        assert(got(i) === hv % 4, s"seq $i")
      }
      // a shard's file set is readable on its own (the data-loader contract)
      assert(spark.read.parquet(s"$dir/shard=0").count() === got.values.count(_ == 0L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("equipment/subsystem catalogs load typed, decorate, and gate by mode") {
    import spark.implicits._
    import graft.model.Telemetry
    val eq = Seq(
      Telemetry.UevolEquipment(1, 10, "eqA", 1, true, false),
      Telemetry.UevolEquipment(2, 20, "eqB", 1, false, true)).toDF()
    val ss = Seq(
      Telemetry.UevolSubsystem(1, "ssA"), Telemetry.UevolSubsystem(2, "ssB")).toDF()
    val got = graft.io.AcquisitionMode.activated(eq, graft.io.Replay)
      .join(ss.withColumnRenamed("name", "subsystem"), "ssty")
      .select("name", "subsystem")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("eqA", "ssA")))
  }

  test("bucketed tables join with NO exchange on either side") {
    import spark.implicits._
    val fact = (1L to 200L).map(i => (i, i * 10)).toDF("id", "v")
    val dim = (1L to 50L).map(i => (i, s"n$i")).toDF("id", "nm")
    graft.io.TableWriter.writeBucketed(fact, "bkt_fact", Seq("id"), 4)
    graft.io.TableWriter.writeBucketed(dim, "bkt_dim", Seq("id"), 4)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the no-shuffle claim is the BUCKETING's doing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_fact").join(spark.table("bkt_dim"), "id")
      assert(joined.count() === 50)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"),
        s"bucket-wise join must not shuffle either side:\n$plan")
      // re-shuffling the fact side breaks co-location: the same join over
      // a non-bucketed temp view DOES exchange — the negative control
      fact.createOrReplaceTempView("plain_fact")
      val control = spark.table("plain_fact").join(spark.table("bkt_dim"), "id")
      control.count()
      assert(control.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bkt_fact")
      spark.sql("DROP TABLE IF EXISTS bkt_dim")
      spark.catalog.dropTempView("plain_fact")
    }
  }
}

class JsonExplodeSpec extends SparkSpec {

  test("degree 0/1/2 flatten with dotted keys; empty object emits nothing") {
    import spark.implicits._
    val df = Seq(
      (1, """{"000":42}"""),
      (2, """{"000.001":1,"000.002":2}"""),
      (3, """{"000.001":{"000.001.001":5,"000.001.002":6}}"""),
      (4, """{}""")).toDF("id", "json_value")
    val got = JsonExplode.flatten(df, "json_value", Seq("id"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set(
      (1, "000", 42.0),
      (2, "000.001", 1.0), (2, "000.002", 2.0),
      (3, "000.001.001", 5.0), (3, "000.001.002", 6.0)))
  }

  test("degree probe") {
    import spark.implicits._
    val df = Seq(
      ("""{"000":42}""", 0), ("""{"000.001":1,"000.002":2}""", 1),
      ("""{"000.001":{"000.001.001":5}}""", 2), ("{}", -1))
      .toDF("j", "want")
    val bad = df.where(JsonExplode.degree(col("j")) =!= col("want")).count()
    assert(bad === 0)
  }

  test("scalar fallback reads dotted-safe '000' leaf") {
    import spark.implicits._
    val df = Seq("""{"000":-1}""").toDF("j")
    assert(df.select(JsonExplode.scalarValue(col("j"))).head().getDouble(0) === -1.0)
  }
}

class SnapshotBracketSpec extends SparkSpec {

  private def catalog = {
    import spark.implicits._
    Seq(SnapshotRef("s0", 0L), SnapshotRef("s100", 100L), SnapshotRef("s200", 200L)).toDF()
  }

  test("target strictly inside an epoch brackets both sides") {
    val (lo, hi) = SnapshotBracket.bracket(catalog, 150L)
    assert(lo === Some(SnapshotRef("s100", 100L)))
    assert(hi === Some(SnapshotRef("s200", 200L)))
  }

  test("target exactly on a snapshot start uses it on both sides (>= rule)") {
    val (lo, hi) = SnapshotBracket.bracket(catalog, 100L)
    assert(lo === Some(SnapshotRef("s100", 100L)))
    assert(hi === Some(SnapshotRef("s100", 100L)))
  }

  test("target == 0 uses the strict > rule for snap_max") {
    val (lo, hi) = SnapshotBracket.bracket(catalog, 0L)
    assert(lo === Some(SnapshotRef("s0", 0L)))
    assert(hi === Some(SnapshotRef("s100", 100L)))
  }

  test("target beyond the last snapshot degenerates to snap_min on both sides") {
    val (lo, hi) = SnapshotBracket.bracket(catalog, 500L)
    assert(lo === Some(SnapshotRef("s200", 200L)))
    assert(hi === Some(SnapshotRef("s200", 200L)))
  }
}

class ChangeSplitSpec extends SparkSpec {

  test("same keeps double rows, diff keys appear once") {
    import spark.implicits._
    val snapA = Seq(
      (1, 10, 20, 0L, """{"000":1}"""),
      (2, 10, 20, 0L, """{"000":2}"""),
      (3, 10, 20, 0L, """{"000":3}"""))
      .toDF("uevol_field_id", "src_id", "dst_id", "instance_message_id", "json_value")
    val snapB = Seq(
      (1, 10, 20, 100L, """{"000":1}"""),   // unchanged
      (2, 10, 20, 100L, """{"000":99}"""),  // changed
      (4, 10, 20, 100L, """{"000":4}"""))   // only in B
      .toDF("uevol_field_id", "src_id", "dst_id", "instance_message_id", "json_value")
    val (same, diff) = ChangeSplit.split(snapA, snapB)
    assert(same.collect().map(_.getInt(0)).toSet === Set(1))
    assert(diff.collect().map(_.getInt(0)).toSet === Set(2, 3, 4))
  }

  test("duplicate rows WITHIN one snapshot cannot fake a both-sides match") {
    import spark.implicits._
    // key 5 appears twice in A (retried dump write) and not at all in B:
    // a row-count split would see n=2 and wrongly skip its log scan
    val snapA = Seq(
      (5, 10, 20, 0L, """{"000":7}"""),
      (5, 10, 20, 0L, """{"000":7}"""))
      .toDF("uevol_field_id", "src_id", "dst_id", "instance_message_id", "json_value")
    val snapB = Seq.empty[(Int, Int, Int, Long, String)]
      .toDF("uevol_field_id", "src_id", "dst_id", "instance_message_id", "json_value")
    val (same, diff) = ChangeSplit.split(snapA, snapB)
    assert(same.count() === 0)
    assert(diff.collect().map(_.getInt(0)).toSet === Set(5))
  }
}

class SnapshotJsonConflictSpec extends SparkSpec {

  test("conflicts() flags a path that is both scalar and deep parent") {
    import spark.implicits._
    val rows = Seq(
      (1, "000.001", 5.0),        // scalar at depth 2 ...
      (1, "000.001.001", 2.0),    // ... AND parent of a deep leaf: conflict
      (2, "000.001", 5.0),        // different key: no conflict
      (1, "000.002", 6.0))
      .toDF("uevol_field_id", "relative_path", "value")
    val bad = graft.ops.SnapshotJson.conflicts(rows, Seq("uevol_field_id"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(bad.toSeq === Seq((1, "000.001")))
  }

  test("conflicts() also flags duplicate rows at the same (key, path)") {
    import spark.implicits._
    val rows = Seq(
      (1, "000", 1.0),
      (1, "000", 2.0),          // duplicate path for key 1: duplicate JSON key
      (2, "000", 3.0))
      .toDF("uevol_field_id", "relative_path", "value")
    val bad = graft.ops.SnapshotJson.conflicts(rows, Seq("uevol_field_id"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(bad.toSeq === Seq((1, "000")))
  }
}

class SkewSaltSpec extends SparkSpec {

  test("salted aggregate equals direct groupBy on a skewed distribution") {
    import spark.implicits._
    // key 1 holds 90% of rows — the shape that straggles one reducer
    val rows = (1 to 900).map(i => (1, i.toDouble)) ++
      (1 to 100).map(i => (1 + i % 9, i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = SkewSalt.aggregate(df, Seq("k"), "v", buckets = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val direct = df.groupBy("k")
      .agg(count(lit(1)), sum("v"), min("v"), max("v"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (n, s, mn, mx)) =>
      val (dn, ds, dmn, dmx) = direct(k)
      assert(n === dn); assert(mn === dmn); assert(mx === dmx)
      assert(math.abs(s - ds) < 1e-9)
    }
  }

  test("salt replication joins back to exactly the original pairs") {
    import spark.implicits._
    val fact = (1 to 200).map(i => (i % 3, i)).toDF("k", "v")
      .withColumn("__salt", SkewSalt.saltColumn(4))
    val dim = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "name")
    val joined = fact.join(SkewSalt.replicateForSalt(dim, 4), Seq("k", "__salt"))
    assert(joined.count() === 200) // every fact row matched exactly once
    assert(joined.select("__salt").distinct().count() === 4)
  }
}

class ResampleSpec extends SparkSpec {

  test("locfGrid: per-key span, step instants, last-writer-wins carry") {
    import spark.implicits._
    val df = Seq((1L, 0L, 1.0, 1L), (1L, 10L, 2.0, 2L), (1L, 10L, 3.0, 3L),
      (1L, 25L, 4.0, 4L), (2L, 5L, 9.0, 1L))
      .toDF("user_id", "tns", "value", "event_id")
    val got = Resample.locfGrid(df, Seq("user_id"), "tns", "value", "event_id", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // u1 span [0,25] -> instants 0,10,20; same-instant t=10 resolves to
    // the ord=3 writer; u2 span is a single instant
    assert(got === Map((1L, 0L) -> 1.0, (1L, 10L) -> 3.0, (1L, 20L) -> 3.0,
      (2L, 5L) -> 9.0))
  }

  test("trailingAgg: inclusive value-based frame, ties share it") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0L, 1.0), (1L, 11L, 50L, 2.0),
      (1L, 12L, 100L, 4.0), (1L, 13L, 100L, 8.0))
      .toDF("user_id", "event_id", "tns", "value")
    val got = Resample.trailingAgg(df, Seq("user_id"), "tns", "value", 60L)
      .collect().map(r => r.getLong(1) -> ((r.getLong(4), r.getDouble(5)))).toMap
    assert(got(10L) === ((1L, 1.0)))
    assert(got(11L) === ((2L, 3.0)))        // [-10, 50] -> {0, 50}
    assert(got(12L) === ((3L, 14.0)))       // [40, 100] -> {50, 100, 100}
    assert(got(13L) === ((3L, 14.0)))       // tie shares the frame
  }
}

/** The time-axis helpers must keep working against BOTH storage
  * generations of the events table — the driver has already switched
  * once (ns-long -> µs TIMESTAMP_NTZ between rounds); these pin the
  * legacy arm so a revert cannot silently break the bounds again.
  */
class TsHelpersSpec extends SparkSpec {

  test("tsLit/epochNs/asTimestamp cover long-ns, NTZ, and LTZ columns") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val ns = graft.io.Tables.nanos("2024-01-10 00:00:00")
    // legacy epoch-ns long storage
    val longDf = Seq((1L, ns - 1L), (2L, ns), (3L, ns + 1000L))
      .toDF("id", "ts")
    val lDt = longDf.schema("ts").dataType
    assert(lDt === LongType)
    val kept = longDf.where(col("ts") >= graft.io.Tables.tsLit(lDt, ns))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
    assert(longDf.select(graft.io.Tables.epochNs(lDt, col("ts")))
      .collect().map(_.getLong(0)).toSeq === Seq(ns - 1L, ns, ns + 1000L))
    val asTs = longDf.select(
      graft.io.Tables.asTimestamp(lDt, "ts").as("t")).schema("t").dataType
    assert(asTs === TimestampType)
    // µs NTZ storage (the current testdata shape)
    val ntzDf = Seq(1L, 2L).toDF("id")
      .withColumn("ts", expr("make_timestamp_ntz(2024, 1, 10, 0, 0, id - 1)"))
    val nDt = ntzDf.schema("ts").dataType
    assert(nDt === TimestampNTZType)
    // NTZ literals carry µs precision (sub-µs floors, as documented) —
    // a 1 ms offset bound excludes the 00:00:00 row, keeps the +1 s row
    val keptN = ntzDf.where(col("ts") >=
        graft.io.Tables.tsLit(nDt, ns + 1000000L))
      .collect().map(_.getLong(0)).toSet
    assert(keptN === Set(2L))
    assert(ntzDf.where(col("id") === 1)
      .select(graft.io.Tables.epochNs(nDt, col("ts")))
      .head().getLong(0) === ns)
    // LTZ column: epochNs agrees (UTC session)
    val ltzDf = ntzDf.withColumn("ts", col("ts").cast("timestamp"))
    val zDt = ltzDf.schema("ts").dataType
    assert(zDt === TimestampType)
    assert(ltzDf.where(col("id") === 1)
      .select(graft.io.Tables.epochNs(zDt, col("ts")))
      .head().getLong(0) === ns)
  }

  test("locfGrid model property: random irregular logs") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val rowsGen = Gen.nonEmptyListOf(for {
      u <- Gen.chooseNum(1L, 2L)
      t <- Gen.chooseNum(0L, 40L)
      v <- Gen.chooseNum(0, 9).map(_.toDouble)
    } yield (u, t, v)).map(_.zipWithIndex.map { case ((u, t, v), i) =>
      (u, t, v, (i + 1).toLong) })
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAllNoShrink(rowsGen) { rows =>
        val got = Resample.locfGrid(rows.toDF("u", "t", "v", "ord"),
            Seq("u"), "t", "v", "ord", stepNs = 7L)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        graft.CacheRegistry.releaseAll()
        val want = rows.groupBy(_._1).flatMap { case (u, g) =>
          // last-writer-wins per instant, then LOCF over the step grid
          val byT = g.groupBy(_._2).view.mapValues(_.maxBy(_._4)._3).toMap
          val (lo, hi) = (g.map(_._2).min, g.map(_._2).max)
          (lo to hi by 7L).map { t =>
            val v = byT.filter(_._1 <= t).maxBy(_._1)._2
            (u, t) -> v
          }
        }.toMap
        got == want
      })
    assert(res.passed, res.status.toString)
  }
}

class Scd2Spec extends SparkSpec {

  import org.apache.spark.sql.functions._

  test("fromLog collapses runs, closes intervals, keeps null runs") {
    import spark.implicits._
    // user 1: a a b b a  -> intervals a[1,3) b[3,5) a[5,open)
    // user 2: null null x -> null[1,3) x[3,open): null is a VALUE
    val log = Seq(
      (1L, 1L, 10L, Some("a")), (1L, 2L, 11L, Some("a")),
      (1L, 3L, 12L, Some("b")), (1L, 4L, 13L, Some("b")),
      (1L, 5L, 14L, Some("a")),
      (2L, 1L, 20L, None), (2L, 2L, 21L, None), (2L, 3L, 22L, Some("x")))
      .toDF("key", "ord", "t", "v")
    val got = graft.ops.Scd2
      .fromLog(log, "key", "t", "ord", "v", openEnd = lit(-1L))
      .orderBy("key", "eff_from")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("∅"),
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "a", 10L, 12L), (1L, "b", 12L, 14L), (1L, "a", 14L, -1L),
      (2L, "∅", 20L, 22L), (2L, "x", 22L, -1L)))
  }

  test("fromLog: one exchange serves both windows") {
    import spark.implicits._
    val log = (1L to 100L).map(i => (i % 5, i, i, s"v${i % 3}"))
      .toDF("key", "t", "ord", "v")
    val plan = graft.ops.Scd2.fromLog(log, "key", "t", "ord", "v")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }
}

class FunnelSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def run(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    graft.ops.Funnel.conversion(rows.toDF("u", "t", "ty"),
        "u", "t", "ty", Seq("a", "b", "c"))
      .collect().map(r => r.getAs[Long]("u") ->
        (r.getAs[Int]("steps_reached"), r.getAs[Int]("converted"),
          r.getAs[Long]("t_step1"), r.getAs[Long]("conv_lag"))).toMap
  }

  test("ordered completion, out-of-order steps don't count") {
    val got = run(Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),   // full funnel
      (2L, 20L, "b"), (2L, 10L, "a"), (2L, 15L, "c"),   // c BEFORE b: stops at b
      (3L, 10L, "c"), (3L, 20L, "b"),                    // no a at all
      (4L, 10L, "a"), (4L, 10L, "b"), (4L, 10L, "c")))   // simultaneous: ties count
    assert(got(1L) === ((3, 1, 10L, 20L)))
    assert(got(2L) === ((2, 0, 10L, -1L)))
    assert(got(3L) === ((0, 0, -1L, -1L)))
    assert(got(4L) === ((3, 1, 10L, 0L)))
  }

  test("earliest-completion is greedy-optimal: later step-1 never helps") {
    // a at 10 and 50; b only at 30: gating on the EARLIEST a still finds b
    val got = run(Seq((1L, 10L, "a"), (1L, 50L, "a"), (1L, 30L, "b"),
      (1L, 60L, "c")))
    assert(got(1L) === ((3, 1, 10L, 50L)))
  }

  test("one exchange serves all step windows and the final rollup") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i % 20, i, Seq("a", "b", "c")(i.toInt % 3)))
      .toDF("u", "t", "ty")
    val plan = graft.ops.Funnel.conversion(df, "u", "t", "ty",
        Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }
}

class SkylineSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import graft.ops.Skyline

  test("non-dominated set exact, equal points all kept, nulls excluded") {
    import spark.implicits._
    val pts = Seq(
      (1L, 1.0, 10L),  // skyline (highest y at x=1)
      (2L, 1.0, 10L),  // duplicate of 1 — equal points don't dominate
      (3L, 1.0, 5L),   // dominated by 1 within its x group
      (4L, 2.0, 8L),   // skyline (no higher-x point has y >= 8)
      (5L, 3.0, 7L),   // skyline
      (6L, 2.0, 7L),   // dominated by 5 (x 3>2, y 7>=7)
      (7L, 0.5, 9L))   // dominated by 1 (x 1>0.5, y 10>9)
      .toDF("id", "x", "y")
      .unionByName(Seq((8L, Option.empty[Double], Option(1L)),
        (9L, Option(1.0), Option.empty[Long])).toDF("id", "x", "y"))
    val got = Skyline.skyline2D(pts, "x", "y")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L, 4L, 5L))
    // every returned row is genuinely non-dominated (property re-check)
    val rows = Skyline.skyline2D(pts, "x", "y")
      .select("x", "y").as[(Double, Long)].collect()
    val all = Seq((1.0, 10L), (1.0, 10L), (1.0, 5L), (2.0, 8L), (3.0, 7L),
      (2.0, 7L), (0.5, 9L))
    rows.foreach { case (x, y) =>
      assert(!all.exists(p => p._1 >= x && p._2 >= y &&
        (p._1 > x || p._2 > y)), s"($x,$y) is dominated")
    }
  }

  test("plan: window runs over the census, skyline broadcasts back") {
    import spark.implicits._
    val pts = (1 to 1000).map(i => (i.toLong, (i % 37).toDouble, (i % 53).toLong))
      .toDF("id", "x", "y")
    val plan = Skyline.skyline2D(pts, "x", "y")
      .queryExecution.executedPlan.toString
    // the semi-join side arrives as a broadcast, never a shuffled join
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the single-partition window input is the aggregated census (its
    // subtree contains the per-x HashAggregate), not the raw point set
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0 && plan.indexOf("HashAggregate", winIdx) >= 0, plan)
  }

  test("skyline of an empty frame is empty; single point survives") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double, Long)].toDF("id", "x", "y")
    assert(Skyline.skyline2D(empty, "x", "y").count() === 0)
    val one = Seq((1L, 0.0, 0L)).toDF("id", "x", "y")
    assert(Skyline.skyline2D(one, "x", "y").count() === 1)
  }

  test("NaN x/y: localSkyline matches batch (NaN greatest, NaN == NaN)") {
    import spark.implicits._
    // Spark SQL's total order makes NaN the GREATEST value and equal to
    // itself; a primitive-== sweep would let the NaN-y point erase the
    // whole frontier (the round-11 advisor finding). Pin local == batch.
    val pts = Seq(
      (1L, 1.0, 10.0),        // dominated: x=2's NaN ymax > 10
      (2L, 2.0, Double.NaN),  // skyline: NaN y beats every lower-x group
      (3L, 3.0, 5.0),         // skyline: highest finite x
      (4L, Double.NaN, 1.0),  // skyline: NaN x is the highest x group
      (5L, 2.0, 7.0))         // dominated within its x group (7 != NaN)
    val df = pts.toDF("id", "x", "y")
    val batch = Skyline.skyline2D(df, "x", "y")
      .select("id").as[Long].collect().sorted.toSeq
    assert(batch === Seq(2L, 3L, 4L))
    val local = Skyline.localSkyline(pts.map(p => (p._1, p._2, p._3)))
      .map(_._1).sorted
    assert(local === batch)
    // -0.0 and 0.0 stay one tie class in both engines
    val zs = Seq((1L, -0.0, 5.0), (2L, 0.0, 5.0), (3L, 0.0, 4.0))
    val zBatch = Skyline.skyline2D(zs.toDF("id", "x", "y"), "x", "y")
      .select("id").as[Long].collect().sorted.toSeq
    val zLocal = Skyline.localSkyline(zs).map(_._1).sorted
    assert(zLocal === zBatch && zBatch === Seq(1L, 2L))
  }
}
