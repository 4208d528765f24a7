package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** KMV distinct-count sketch (`graft_kmv` + the Sketches surface):
  * the sketch must equal the literal bottom-k of the distinct hash set
  * under any partitioning (partial/merge path), the estimator must be
  * exact below k and statistically tight above it, and the theta-splice
  * overlap must be exact when both sketches are exact.
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  private def hashed(n: Int, salt: String = "") =
    spark.range(n).select(Sketches.hash60(concat(lit(salt), col("id"))).as("h"))

  test("sketch = distinct bottom-k, invariant under partitioning") {
    // duplicate every value 3x so within- and cross-partition dedup both fire
    val vals = hashed(500).union(hashed(500)).union(hashed(500))
    val expect = vals.distinct().orderBy("h").limit(64)
      .agg(collect_list("h")).as[Seq[Long]].head()
    for (parts <- Seq(1, 7)) {
      val sk = vals.repartition(parts)
        .agg(Sketches.kmvAgg(vals, col("h"), 64).as("s"))
        .select($"s").as[Seq[Long]].head()
      assert(sk === expect, s"parts=$parts")
    }
  }

  test("fewer than k distinct values -> exact sketch, exact estimate") {
    val out = Sketches.kmvDistinct(hashed(10), col("h"), k = 256).head()
    assert(out.getAs[Int]("n_sketch") === 10)
    assert(out.getAs[Double]("est_distinct") === 10.0)
  }

  test("null inputs are skipped, all-null input -> empty sketch, est 0") {
    val mixed = hashed(5).union(Seq.fill(3)(null.asInstanceOf[java.lang.Long])
      .toDF("h").select(col("h").cast("long")))
    val sk = mixed.agg(Sketches.kmvAgg(mixed, col("h"), 16).as("s"))
      .select($"s").as[Seq[Long]].head()
    assert(sk.length === 5)
    val empty = Sketches.kmvDistinct(hashed(0), col("h"), k = 16).head()
    assert(empty.getSeq[Long](empty.fieldIndex("sketch")).isEmpty)
    assert(empty.getAs[Double]("est_distinct") === 0.0)
  }

  test("estimate within 20% of the true cardinality at k=256, n=20000") {
    // md5 is uniform on the 60-bit space; relative error is ~1/sqrt(k-2)
    // ≈ 6.3% per Bar-Yossef et al. — 20% is a >3-sigma acceptance band
    val est = Sketches.kmvDistinct(hashed(20000), col("h"), k = 256)
      .head().getAs[Double]("est_distinct")
    assert(math.abs(est - 20000.0) / 20000.0 < 0.2, s"est=$est")
  }

  test("overlap splice is exact when both sketches are exact") {
    // |A|=60, |B|=50, |A∩B|=30: with k=256 both sketches hold everything,
    // so the splice degrades to exact set algebra
    val a = hashed(60)
    val b = hashed(80).where(col("h").isin(
      hashed(30).as[Long].collect(): _*)).union(hashed(20, salt = "b"))
    val row = Sketches.kmvOverlap(a, b, col("h"), col("h"), k = 256).head()
    assert(row.getAs[Int]("n_a") === 60)
    assert(row.getAs[Int]("n_b") === 50)
    assert(row.getAs[Int]("matches") === 30)
    assert(row.getAs[Int]("n_union_sketch") === 80)
    assert(row.getAs[Double]("jaccard_est") === 30.0 / 80.0)
    assert(row.getAs[Double]("union_est") === 80.0)
    assert(row.getAs[Double]("inter_est") === 30.0)
  }

  test("grouped aggregation yields each group's own bottom-k (d92 shape)") {
    val vals = hashed(600).withColumn("g", pmod(col("h"), lit(3L)))
    val got = vals.groupBy("g")
      .agg(Sketches.kmvAgg(vals, col("h"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (g <- 0L to 2L) {
      val expect = vals.where(col("g") === g).select("h")
        .distinct().orderBy("h").limit(16)
        .agg(collect_list("h")).as[Seq[Long]].head()
      assert(got(g) === expect, s"group $g")
    }
  }

  test("streamed sketch across micro-batches equals the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Long]
    val stream = in.toDF().select(Sketches.hash60(col("value")).as("h"))
    val agg = stream.agg(Sketches.kmvAgg(stream, col("h"), 32).as("s"))
    val q = agg.writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    try {
      in.addData(0L to 99L: _*)
      q.processAllAvailable()
      in.addData(50L to 199L: _*) // overlap: state must dedup across batches
      q.processAllAvailable()
      val last = spark.table("kmv_stream").collect().last.getSeq[Long](0)
      val expect = hashed(200).distinct().orderBy("h").limit(32)
        .agg(collect_list("h")).as[Seq[Long]].head()
      assert(last === expect)
    } finally q.stop()
  }

  test("aggregation is partial+final (no pre-shuffle of raw values)") {
    val vals = hashed(1000)
    val plan = vals.agg(Sketches.kmvAgg(vals, col("h"), 64))
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate runs as ObjectHashAggregate with a partial
    // stage before the exchange — the bounded-shuffle property d86 rides on
    assert(plan.contains("ObjectHashAggregate"))
    assert("Exchange".r.findAllIn(plan).size === 1)
  }
}

/** Count-Min sketch (`graft_cms` + the Sketches surface): the sketch must
  * equal the closed-form per-bucket census under any partitioning, merge
  * must be element-wise addition, estimates must never undercount and be
  * exact without collisions, and the streamed sketch must equal the batch
  * one to the last bucket.
  */
class CmsSpec extends SparkSpec {

  import spark.implicits._
  import graft.plans.CmsSketch.{P => CP}

  private def hashed(n: Int, salt: String = "") =
    spark.range(n).select(Sketches.hash60(concat(lit(salt), col("id"))).as("h"))

  /** The reference sketch, computed in plain Scala from the same closed
    * form the aggregate's JVM loop and the DuckDB oracles evaluate.
    */
  private def reference(hs: Seq[Long], depth: Int, width: Int): Seq[Long] = {
    val buf = Array.fill(depth * width)(0L)
    for (h <- hs) {
      val h1 = h & CP
      val h2 = 1L + ((h >>> 31) & CP)
      for (r <- 0 until depth)
        buf(r * width + (((h1 + r * h2) % CP) % width).toInt) += 1L
    }
    buf.toSeq
  }

  test("sketch = closed-form bucket census, invariant under partitioning") {
    // duplicates INCLUDED: CMS counts occurrences, not distincts
    val vals = hashed(300).union(hashed(100))
    val hs = vals.as[Long].collect().toSeq
    val expect = reference(hs, depth = 4, width = 64)
    for (parts <- Seq(1, 7)) {
      val sk = vals.repartition(parts)
        .agg(Sketches.cmsAgg(vals, col("h"), 4, 64).as("s"))
        .select($"s").as[Seq[Long]].head()
      assert(sk === expect, s"parts=$parts")
    }
  }

  test("merge is element-wise addition: sketch(A ∪ B) = sketch(A) + sketch(B)") {
    val a = hashed(200)
    val b = hashed(150, salt = "b")
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(Sketches.cmsAgg(df, col("h"), 4, 32).as("s"))
        .select($"s").as[Seq[Long]].head()
    val summed = sk(a).zip(sk(b)).map { case (x, y) => x + y }
    assert(sk(a.union(b)) === summed)
  }

  test("estimates never undercount; exact when the table is collision-free") {
    // 20 keys in a 4x1024 table: collisions are possible but each key's
    // min-over-rows must still be >= its true count; with so few keys the
    // chance all four rows collide for some key is negligible, so est is
    // exact here (and the assert documents WHICH keys would break it)
    val freq = (1 to 20).map(i => i.toLong -> i.toLong) // key i occurs i times
    val rows = freq.flatMap { case (k, n) => Seq.fill(n.toInt)(k) }
    val df = rows.toDF("v").select(Sketches.hash60(col("v")).as("h"))
    val out = Sketches.cmsTopFreq(df, col("h"), depth = 4, width = 1024,
      topK = 20).collect()
    assert(out.length === 20)
    out.foreach { r =>
      assert(r.getAs[Int]("no_undercount") === 1, r.toString)
      assert(r.getAs[Long]("cms_est") === r.getAs[Long]("cnt_true"), r.toString)
    }
  }

  test("forced collisions (width 2): still no undercount, overcount visible") {
    val df = (1 to 50).map(_.toLong).toDF("v")
      .select(Sketches.hash60(col("v")).as("h"))
    val out = Sketches.cmsTopFreq(df, col("h"), depth = 2, width = 2,
      topK = 10).collect()
    out.foreach(r => assert(r.getAs[Long]("cms_est") >=
      r.getAs[Long]("cnt_true"), r.toString))
    // 50 distinct keys into 2x2 buckets MUST overcount somewhere
    assert(out.exists(r => r.getAs[Long]("cms_est") > r.getAs[Long]("cnt_true")))
  }

  test("null inputs are skipped; empty input -> all-zero sketch") {
    val mixed = hashed(5).union(Seq.fill(3)(null.asInstanceOf[java.lang.Long])
      .toDF("h").select(col("h").cast("long")))
    val sk = mixed.agg(Sketches.cmsAgg(mixed, col("h"), 2, 16).as("s"))
      .select($"s").as[Seq[Long]].head()
    assert(sk === reference(hashed(5).as[Long].collect().toSeq, 2, 16))
    val empty = hashed(0)
    val sk0 = empty.agg(Sketches.cmsAgg(empty, col("h"), 2, 16).as("s"))
      .select($"s").as[Seq[Long]].head()
    assert(sk0 === Seq.fill(32)(0L))
  }

  test("grouped aggregation yields each group's own sketch (d111 shape)") {
    val vals = hashed(600).withColumn("g", pmod(col("h"), lit(3L)))
    val got = vals.groupBy("g")
      .agg(Sketches.cmsAgg(vals, col("h"), 4, 32).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (g <- 0L to 2L) {
      val hs = vals.where(col("g") === g).select("h").as[Long].collect().toSeq
      assert(got(g) === reference(hs, 4, 32), s"group $g")
    }
  }

  test("streamed sketch across micro-batches equals the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Long]
    val stream = in.toDF().select(Sketches.hash60(col("value")).as("h"))
    val agg = stream.agg(Sketches.cmsAgg(stream, col("h"), 4, 32).as("s"))
    val q = agg.writeStream.format("memory").queryName("cms_stream")
      .outputMode("update").start()
    try {
      in.addData(0L to 99L: _*)
      q.processAllAvailable()
      in.addData(50L to 199L: _*) // 50..99 occur TWICE — counts accumulate
      q.processAllAvailable()
      val last = spark.table("cms_stream").collect().last.getSeq[Long](0)
      val hs = (0L to 99L) ++ (50L to 199L)
      val expect = reference(
        hs.toDF("v").select(Sketches.hash60(col("v")).as("h"))
          .as[Long].collect().toSeq, 4, 32)
      assert(last === expect)
    } finally q.stop()
  }

  test("aggregation is partial+final (no pre-shuffle of raw values)") {
    val vals = hashed(1000)
    val plan = vals.agg(Sketches.cmsAgg(vals, col("h"), 4, 256))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert("Exchange".r.findAllIn(plan).size === 1)
  }

  test("inner product: exact when collision-free, never an underestimate") {
    // A holds key i with freq i (1..10), B holds key i with freq 11-i for
    // even i only: true join size = sum over even i of i*(11-i)
    val aRows = (1 to 10).flatMap(i => Seq.fill(i)(i.toLong))
    val bRows = (1 to 10).filter(_ % 2 == 0)
      .flatMap(i => Seq.fill(11 - i)(i.toLong))
    val a = aRows.toDF("v").select(Sketches.hash60(col("v")).as("h"))
    val b = bRows.toDF("v").select(Sketches.hash60(col("v")).as("h"))
    val expect = (1 to 10).filter(_ % 2 == 0).map(i => i * (11 - i)).sum
    val row = Sketches.cmsJoinSize(a, b, col("h"), col("h"),
      depth = 4, width = 1024).head()
    assert(row.getAs[Long]("true_join") === expect.toLong)
    assert(row.getAs[Long]("est_join") === expect.toLong) // 10 keys, no collisions
    assert(row.getAs[Int]("no_underestimate") === 1)
    // forced collisions (width 2): estimate inflates but never undercuts
    val tight = Sketches.cmsJoinSize(a, b, col("h"), col("h"),
      depth = 2, width = 2).head()
    assert(tight.getAs[Long]("est_join") >= tight.getAs[Long]("true_join"))
    // disjoint streams: truth is 0, the flag still holds
    val c = (100 to 110).map(_.toLong).toDF("v")
      .select(Sketches.hash60(col("v")).as("h"))
    val dis = Sketches.cmsJoinSize(a, c, col("h"), col("h"),
      depth = 4, width = 1024).head()
    assert(dis.getAs[Long]("true_join") === 0L)
    assert(dis.getAs[Int]("no_underestimate") === 1)
  }

  test("cmsSummary: n_items equals the input size (row 0 sums to N)") {
    val vals = hashed(123).union(hashed(77))
    val row = vals.agg(Sketches.cmsAgg(vals, col("h"), 4, 32).as("s"))
      .select(Sketches.cmsSummary(col("s"), 4, 32): _*).head()
    assert(row.getAs[Long]("n_items") === 200L)
    assert(row.getAs[String]("sketch_csv").split(",").length === 128)
  }
}

/** Count-Sketch (`graft_countsketch` + the Sketches surface): the signed
  * sketch must equal the closed-form ±1 census under any partitioning,
  * merge must be element-wise addition, the median-of-rows inner product
  * must be exact without collisions and UNBIASED (not an upper bound) in
  * the sparse regime the CMS estimator is loose in.
  */
class CountSketchSpec extends SparkSpec {

  import spark.implicits._
  import graft.plans.CmsSketch.{P => CP}

  private def hashed(n: Int, salt: String = "") =
    spark.range(n).select(Sketches.hash60(concat(lit(salt), col("id"))).as("h"))

  /** The reference signed sketch, computed in plain Scala from the same
    * closed form the aggregate's JVM loop and the d118 oracle evaluate.
    */
  private def reference(hs: Seq[Long], depth: Int, width: Int): Seq[Long] = {
    val buf = Array.fill(depth * width)(0L)
    for (h <- hs) {
      val h1 = h & CP
      val h2 = 1L + ((h >>> 31) & CP)
      for (r <- 0 until depth) {
        val b = (((h1 + r * h2) % CP) % width).toInt
        val s = 1L - 2L * (((h1 + (depth + r) * h2) % CP) & 1L)
        buf(r * width + b) += s
      }
    }
    buf.toSeq
  }

  test("signed sketch = closed-form ±1 census, invariant under partitioning") {
    val vals = hashed(300).union(hashed(100))
    val hs = vals.as[Long].collect().toSeq
    val expect = reference(hs, depth = 5, width = 64)
    for (parts <- Seq(1, 7)) {
      val sk = vals.repartition(parts)
        .agg(Sketches.csAgg(vals, col("h"), 5, 64).as("s"))
        .select($"s").as[Seq[Long]].head()
      assert(sk === expect, s"parts=$parts")
    }
    // signs actually fire: a signed sketch of distinct items has negative
    // cells (a CMS never does)
    assert(expect.exists(_ < 0))
  }

  test("merge is element-wise addition: sketch(A ∪ B) = sketch(A) + sketch(B)") {
    val a = hashed(200)
    val b = hashed(150, salt = "b")
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(Sketches.csAgg(df, col("h"), 5, 32).as("s"))
        .select($"s").as[Seq[Long]].head()
    val summed = sk(a).zip(sk(b)).map { case (x, y) => x + y }
    assert(sk(a.union(b)) === summed)
  }

  test("inner product: exact when collision-free; unbiased in the sparse regime") {
    // the d250-style frequency fixture: collision-free at width 1024, so
    // every row's product sum IS the true join and the median is exact
    val aRows = (1 to 10).flatMap(i => Seq.fill(i)(i.toLong))
    val bRows = (1 to 10).filter(_ % 2 == 0)
      .flatMap(i => Seq.fill(11 - i)(i.toLong))
    val a = aRows.toDF("v").select(Sketches.hash60(col("v")).as("h"))
    val b = bRows.toDF("v").select(Sketches.hash60(col("v")).as("h"))
    val expect = (1 to 10).filter(_ % 2 == 0).map(i => i * (11 - i)).sum
    val row = Sketches.csJoinSize(a, b, col("h"), col("h"),
      depth = 5, width = 1024, band = 0.1).head()
    assert(row.getAs[Long]("true_join") === expect.toLong)
    assert(row.getAs[Long]("est_join") === expect.toLong)
    assert(row.getAs[Int]("in_band") === 1)
    assert(row.getAs[String]("sketch_csv_a").split(",").length === 5 * 1024)
    // sparse regime (5000 distinct keys on each side, width 128 => heavy
    // collisions): the CMS min-over-rows stacks positive collision mass —
    // a multiple of the truth — while the AMS median stays within ±50%
    val sa = hashed(5000)
    val sb = hashed(5000, salt = "")
    val cms = Sketches.cmsJoinSize(sa, sb, col("h"), col("h"),
      depth = 5, width = 128).head()
    val ams = Sketches.csJoinSize(sa, sb, col("h"), col("h"),
      depth = 5, width = 128, band = 0.5).head()
    val truth = cms.getAs[Long]("true_join").toDouble
    assert(cms.getAs[Long]("est_join") > 2 * truth,
      s"CMS should be loose here: ${cms.getAs[Long]("est_join")} vs $truth")
    assert(ams.getAs[Int]("in_band") === 1,
      s"AMS drifted: ${ams.getAs[Long]("est_join")} vs $truth")
    // disjoint streams: truth 0, the unbiased estimate must not pretend
    // otherwise beyond noise — gate only the summary's null convention
    val c = (100000 to 100010).map(_.toLong).toDF("v")
      .select(Sketches.hash60(col("v")).as("h"))
    val dis = Sketches.csJoinSize(a, c, col("h"), col("h"),
      depth = 5, width = 1024, band = 0.1).head()
    assert(dis.getAs[Long]("true_join") === 0L)
    assert(dis.isNullAt(dis.fieldIndex("est_over_true")))
  }

  test("csInnerProduct rejects even depth loudly (median must be exact)") {
    val e = intercept[IllegalArgumentException] {
      Sketches.csInnerProduct(col("a"), col("b"), depth = 4, width = 64)
    }
    assert(e.getMessage.contains("odd"))
  }

  test("aggregation is partial+final (no pre-shuffle of raw values)") {
    val vals = hashed(100)
    val plan = vals.agg(Sketches.csAgg(vals, col("h"), 5, 32).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert("Exchange".r.findAllIn(plan).size === 1)
  }
}

class CorpusCatalogSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import graft.functions.{CorpusCatalog, MinHashLSH, Sketches}

  test("persisted catalog answers overlaps identically to direct sketches") {
    import spark.implicits._
    def dump(tag: String, ids: Range) = ids.map(i =>
      (i.toLong, s"$tag shared alpha beta gamma token$i delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    // d1/d2 share the per-dump tag-free grams partially; d3 is disjoint
    val d1 = dump("x", 0 until 40)
    val d2 = dump("x", 20 until 60) // 50% doc overlap with d1, same tag
    // a fully disjoint vocabulary — every token is dump3-unique, so no
    // 3-gram can coincide with the template grams of dump1/dump2
    val d3 = (0 until 10).map(i =>
      (i.toLong, (0 until 11).map(j => s"q${i}w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val path = graft.WorkDirs.acquire("test_catalog").toString
    CorpusCatalog.append(d1, "doc_id", "text", path, "dump1", k = 64)
    CorpusCatalog.append(d2, "doc_id", "text", path, "dump2", k = 64)
    CorpusCatalog.append(d3, "doc_id", "text", path, "dump3", k = 64)

    val cat = spark.read.parquet(path)
    assert(cat.count() === 3)
    val row1 = cat.where(col("dump_id") === "dump1").head()
    assert(row1.getAs[Long]("n_docs") === 40)
    assert(row1.getAs[Long]("n_tokens") === 40 * 11) // 11 words per doc
    assert(row1.getAs[Int]("k") === 64) // sketch size rides with the row

    // the stored k governs the splice: the caller's (wrong) default is
    // ignored, so a k=64 catalog read under the k=256 default cannot be
    // silently treated as exact sets
    val got = CorpusCatalog.overlaps(spark, path)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Int]("matches"), r.getAs[Double]("jaccard_est"))).toMap
    // direct computation over the corpora must agree exactly
    def direct(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) = {
      val r = Sketches.kmvOverlap(
        MinHashLSH.shingles(a, "doc_id", "text", 3),
        MinHashLSH.shingles(b, "doc_id", "text", 3),
        col("sh"), col("sh"), k = 64).head()
      (r.getAs[Int]("matches"), r.getAs[Double]("jaccard_est"))
    }
    assert(got(("dump1", "dump2")) === direct(d1, d2))
    assert(got(("dump1", "dump3")) === direct(d1, d3))
    assert(got(("dump2", "dump3")) === direct(d2, d3))
    // sanity on the semantics: overlapping dumps share grams, the
    // disjoint-tag dump shares none
    assert(got(("dump1", "dump2"))._1 > 0)
    assert(got(("dump1", "dump3"))._1 === 0)

    // round 12: the SAME catalog answers pairwise gram-equijoin sizes
    // from its stored CMS sketches, identically to the in-query splice
    val sizes = CorpusCatalog.joinSizes(spark, path)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDecimal(2).longValueExact, r.getDecimal(3).longValueExact))
      .toMap
    def directJoin(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Sketches.cmsJoinSize(
        MinHashLSH.shingles(a, "doc_id", "text", 3),
        MinHashLSH.shingles(b, "doc_id", "text", 3),
        col("sh"), col("sh"), depth = 4, width = 2048).head()
    def directCs(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Sketches.csJoinSize(
        MinHashLSH.shingles(a, "doc_id", "text", 3),
        MinHashLSH.shingles(b, "doc_id", "text", 3),
        col("sh"), col("sh"), depth = 5, width = 2048, band = 0.5).head()
    for ((pair, (x, y)) <- Seq(("dump1", "dump2") -> ((d1, d2)),
        ("dump1", "dump3") -> ((d1, d3)), ("dump2", "dump3") -> ((d2, d3)))) {
      val direct = directJoin(x, y)
      assert(sizes(pair)._1 === direct.getAs[Long]("est_join"), pair)
      assert(sizes(pair)._1 >= direct.getAs[Long]("true_join"), pair)
      // the second column: the stored Count-Sketches splice to the same
      // unbiased estimate the in-query path computes
      assert(sizes(pair)._2 === directCs(x, y).getAs[Long]("est_join"), pair)
    }
  }

  test("joinSizes rejects catalogs with mixed CMS dimensions loudly") {
    import spark.implicits._
    val d = (0 until 5).map(i => (i.toLong, s"a b c d e f$i g h i j k"))
      .toDF("doc_id", "text")
    val path = graft.WorkDirs.acquire("test_catalog_mix").toString
    CorpusCatalog.append(d, "doc_id", "text", path, "d1", cmsWidth = 2048)
    CorpusCatalog.append(d, "doc_id", "text", path, "d2", cmsWidth = 256)
    val e = intercept[IllegalArgumentException] {
      CorpusCatalog.joinSizes(spark, path).collect()
    }
    assert(e.getMessage.contains("mixes CMS dimensions"))
  }

  test("persisted catalog answers domain drift identically to direct JSD") {
    import spark.implicits._
    def dump(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "text", "source")
    val a = dump(Seq((1L, "a b c d", "web"), (2L, "e f g h", "web"),
      (3L, "i j k l", "book"), (4L, "m n o p", "wiki")))
    val b = dump(Seq((5L, "a b c d", "web"), (6L, "q r s t", "book"),
      (7L, "u v w x", "book"), (8L, "y z a b", "code")))
    val path = graft.WorkDirs.acquire("test_catalog_jsd").toString
    CorpusCatalog.append(a, "doc_id", "text", path, "relA",
      domainCol = Some("source"))
    CorpusCatalog.append(b, "doc_id", "text", path, "relB",
      domainCol = Some("source"))
    val fromCatalog = CorpusCatalog.domainDrift(spark, path, "relA", "relB")
      .collect().head
    val direct = graft.functions.Sampling.jensenShannon(a, b, "source")
      .collect().head
    assert(fromCatalog === direct) // catalog path == corpus path
    // the census column itself is the exact groupBy count
    val cen = CorpusCatalog.domainCensus(spark, path, "relA")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cen === Map("web" -> 2L, "book" -> 1L, "wiki" -> 1L))
  }

  test("domainCensus fails loudly on a dump appended without a domainCol") {
    import spark.implicits._
    val d = (0 until 4).map(i => (i.toLong, s"a b c d$i", "web"))
      .toDF("doc_id", "text", "source")
    val path = graft.WorkDirs.acquire("test_catalog_nodom").toString
    CorpusCatalog.append(d, "doc_id", "text", path, "old") // pre-census row
    CorpusCatalog.append(d, "doc_id", "text", path, "new",
      domainCol = Some("source"))
    // the census-carrying row works; the null-census row is refused
    // instead of exploding into an empty census that reads as total drift
    assert(CorpusCatalog.domainCensus(spark, path, "new").count() === 1)
    val e = intercept[IllegalArgumentException] {
      CorpusCatalog.domainCensus(spark, path, "old").collect()
    }
    assert(e.getMessage.contains("no domain census"))
  }

  test("persisted embedding census answers drift identically to d143") {
    import spark.implicits._
    import graft.functions.VectorOps
    def vecs(ids: Range, shift: Float) = ids.map(i =>
      (i.toLong, Array(0.1f + shift, 0.2f, 0.3f + i * 0.01f)))
      .toDF("vec_id", "embedding")
    val p = vecs(0 until 10, 0f)
    val q = vecs(10 until 20, 0.5f)
    val path = graft.WorkDirs.acquire("test_catalog_ecen").toString
    CorpusCatalog.appendEmbeddingCensus(p, "embedding", path, "relA")
    CorpusCatalog.appendEmbeddingCensus(q, "embedding", path, "relB")
    val fromCatalog = CorpusCatalog
      .embeddingDriftFromCatalog(spark, path, "relA", "relB")
      .collect().map(r => r.getLong(0) -> r).toMap
    val direct = VectorOps.embeddingDrift(p, q, "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(fromCatalog.keySet === direct.keySet)
    for ((dim, row) <- direct) assert(fromCatalog(dim) === row, s"dim=$dim")
    // a re-appended release would double the moments: refused loudly
    CorpusCatalog.appendEmbeddingCensus(p, "embedding", path, "relA")
    val e = intercept[IllegalArgumentException] {
      CorpusCatalog.embeddingDriftFromCatalog(spark, path, "relA", "relB")
        .collect()
    }
    assert(e.getMessage.contains("duplicate dim rows"))
  }

  test("persisted catalog answers duplication concentration identically " +
    "to the direct profile") {
    import spark.implicits._
    val d = (0 until 12).map(i => (i.toLong, s"a b c d$i e f g h i j k"))
      .toDF("doc_id", "text")
    // a labeling with a skewed size mix: one 5-cluster, one 3, two 2s —
    // ties in the histogram (the two 2s) exercise the rank-collapse path
    val labels = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 10L, 5L -> 10L,
      6L -> 20L, 7L -> 20L, 8L -> 20L, 9L -> 30L, 10L -> 30L,
      11L -> 40L, 12L -> 40L).toDF("id", "cluster")
    val path = graft.WorkDirs.acquire("test_catalog_dup").toString
    CorpusCatalog.append(d, "doc_id", "text", path, "rel",
      clusterLabels = Some(labels))
    val fromCatalog = MinHashLSH.clusterSizeProfileFromHistogram(
      CorpusCatalog.clusterCensus(spark, path, "rel"), "sz", "cnt")
      .collect().head
    val direct = MinHashLSH.clusterSizeProfile(labels).collect().head
    assert(fromCatalog === direct) // catalog path == direct path
    assert(direct.getAs[Long]("n_clusters") === 4L)
    assert(direct.getAs[Long]("n_members") === 12L)
    assert(direct.getAs[Long]("max_cluster") === 5L)
  }

  test("clusterCensus fails loudly on a dump appended without labels") {
    import spark.implicits._
    val d = (0 until 4).map(i => (i.toLong, s"a b c d$i e f g h i j k"))
      .toDF("doc_id", "text")
    val labels = Seq(1L -> 10L, 2L -> 10L).toDF("id", "cluster")
    val path = graft.WorkDirs.acquire("test_catalog_nocl").toString
    CorpusCatalog.append(d, "doc_id", "text", path, "old") // pre-census row
    CorpusCatalog.append(d, "doc_id", "text", path, "new",
      clusterLabels = Some(labels))
    assert(CorpusCatalog.clusterCensus(spark, path, "new").count() === 1)
    val e = intercept[IllegalArgumentException] {
      CorpusCatalog.clusterCensus(spark, path, "old").collect()
    }
    assert(e.getMessage.contains("no cluster census"))
  }

  test("persisted catalog answers containment posture identically to the " +
    "direct profile") {
    import spark.implicits._
    import graft.functions.JaccardJoin
    val d = (0 until 10).map(i => (i.toLong, s"a b c d$i e f g h i j k"))
      .toDF("doc_id", "text")
    // a verdict mix with repeated (verdict, fan-in) pairs so the census
    // genuinely compresses: 4 keeps at nc=0, 2 keeps at nc=1 (mutual
    // survivors), 3 drops at nc=1, 1 drop at nc=3
    val verdicts = Seq(
      (0L, "keep", 0L), (1L, "keep", 0L), (2L, "keep", 0L), (3L, "keep", 0L),
      (4L, "keep", 1L), (5L, "keep", 1L),
      (6L, "drop", 1L), (7L, "drop", 1L), (8L, "drop", 1L),
      (9L, "drop", 3L)).toDF("doc_id", "verdict", "n_containers")
    val path = graft.WorkDirs.acquire("test_catalog_cont").toString
    CorpusCatalog.append(d, "doc_id", "text", path, "rel",
      containmentVerdicts = Some(verdicts))
    val fromCatalog = JaccardJoin.containmentProfileFromCensus(
      CorpusCatalog.containmentCensus(spark, path, "rel"))
      .collect().head
    val direct = JaccardJoin.containmentProfile(verdicts).collect().head
    assert(fromCatalog === direct) // catalog path == direct path
    assert(direct.getAs[Long]("n_docs") === 10L)
    assert(direct.getAs[Long]("n_keep") === 6L)
    assert(direct.getAs[Long]("n_drop") === 4L)
    assert(direct.getAs[Long]("n_contained") === 6L)
    assert(direct.getAs[Long]("max_containers") === 3L)
    assert(direct.getAs[Long]("n_container_edges") === 8L)
    // and the loud-failure contract on a row appended without verdicts
    CorpusCatalog.append(d, "doc_id", "text", path, "bare")
    val e = intercept[IllegalArgumentException] {
      CorpusCatalog.containmentCensus(spark, path, "bare").collect()
    }
    assert(e.getMessage.contains("no containment census"))
  }

  test("persisted catalog answers heavy-gram drift identically to " +
    "in-memory rows, with conservative CMS estimates") {
    import spark.implicits._
    // release A: gram "a b c" in every doc; release B: it survives in 2
    // docs while "x y z" surges into every doc — the drift must read the
    // surge from exact top-set counts and fill the missing sides from CMS
    val a = (0 until 8).map(i => (i.toLong, s"a b c pad$i"))
      .toDF("doc_id", "text")
    val b = ((0 until 2).map(i => (100L + i, s"a b c pad$i")) ++
      (2 until 10).map(i => (100L + i, s"x y z pad$i")))
      .toDF("doc_id", "text")
    val path = graft.WorkDirs.acquire("test_catalog_heavy").toString
    CorpusCatalog.append(a, "doc_id", "text", path, "relA",
      topGrams = Some(3))
    CorpusCatalog.append(b, "doc_id", "text", path, "relB",
      topGrams = Some(3))
    val fromCatalog = CorpusCatalog.heavyGramDrift(spark, path, "relA", "relB")
    val direct = CorpusCatalog.heavyGramDriftFromRows(
      CorpusCatalog.summarize(a, "doc_id", "text", "relA", topGrams = Some(3)),
      CorpusCatalog.summarize(b, "doc_id", "text", "relB", topGrams = Some(3)))
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
    val got = keyed(fromCatalog)
    assert(got === keyed(direct)) // catalog path == in-memory path
    // semantics: every doc's distinct-gram doc-frequency is exact where
    // the gram made the top set, and the CMS fill never undercounts —
    // so no gram's surge is overstated
    val abc = graft.functions.MinHashLSH
      .shingles(a.limit(1), "doc_id", "text", 3)
      .collect() // 2 grams per 4-word doc; just sanity that grams exist
    assert(abc.length === 2)
    // "a b c" is top in A (8 docs) and top in B (2 docs): exact on both
    val inBoth = got.filter { case (_, v) => v._1 == 1 && v._2 == 1 }
    assert(inBoth.exists { case (_, v) => v._3 === 8L && v._4 === 2L &&
      v._5 === -6L })
    // "x y z"-side grams: top in B at 8 docs, CMS-estimated on the A side
    // where they never occur — the estimate is >= 0 and the conservative
    // direction bounds the surge from below: est_a >= true 0 ⇒ surge <= 8
    val onlyB = got.filter { case (_, v) => v._1 == 0 && v._2 == 1 }
    assert(onlyB.nonEmpty)
    onlyB.values.foreach { v =>
      assert(v._3 >= 0L && v._4 === 8L && v._5 <= 8L)
    }
    // loud-failure contract on a row appended without topGrams
    CorpusCatalog.append(a, "doc_id", "text", path, "bare")
    val e2 = intercept[IllegalArgumentException] {
      CorpusCatalog.gramTopk(spark, path, "bare").collect()
    }
    assert(e2.getMessage.contains("no top-gram census"))
  }
}
