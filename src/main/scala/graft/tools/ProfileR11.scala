package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-11 adjudication harness for the four driver-bench exceedances
  * (d13 6.9x, d12 3.6x, d30/d36 ~2x, plus any named set): times arbitrary
  * SparkEntry queries under EXACT Bench.scala conditions — same session
  * config, same cold+3-warm min statistic, same dropCaches between runs —
  * either in ISOLATION or after replaying a sorted-order PREFIX of the
  * suite, so "slow only in-suite" separates from "slow, period".
  *
  * Usage: runMain graft.tools.ProfileR11 <mode> <names-csv>
  *   mode = iso            time each name in isolation (fresh-session order)
  *   mode = prefix         run every query in bench (sorted) order ONCE
  *                         cold, timing all of them — the in-suite replay
  *   mode = after:<q>      run <q> once (cold+warm), then time the names —
  *                         pairwise interference probe
  */
object ProfileR11 {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("iso")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq("d13_winnow"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.debug.maxToStringFields", "10000")
      .config("spark.ui.enabled", "false")
    // optional: cap plan-description rendering (AQE posts explainString per
    // plan update) to measure its share of big-plan queries' wall time
    val spark = sys.env.get("SPARK_GRAFT_MAXPLAN")
      .fold(b)(v => b.config("spark.sql.maxPlanStringLength", v))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    def dropCaches(): Unit = {
      graft.CacheRegistry.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      graft.Checkpoints.releaseAll()
    }
    def once(name: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable => println(s"  $name FAILED: $e"); -1.0 }
      finally dropCaches()
    }
    def bench(name: String): Unit = {
      val runs = (1 to 4).map(_ => once(name))
      println(f"BENCH $name%-26s min=${runs.min}%7.3f  runs=${runs.map(r => f"$r%.3f").mkString("[", ",", "]")}")
    }

    mode match {
      case "iso" => names.foreach(bench)
      case "prefix" =>
        val all = graft.SparkEntry.queries.keys.toSeq.sorted
        val watch = names.toSet
        all.foreach { n =>
          val t = once(n)
          val mark = if (watch(n)) "  <== WATCH" else ""
          println(f"PREFIX $n%-26s ${t}%7.3f$mark")
        }
        // after the full pass, re-time the watched names warm (bench stat)
        names.foreach(bench)
      case m if m.startsWith("after:") =>
        val pre = m.stripPrefix("after:")
        println(s"-- running $pre 4x first --"); bench(pre)
        names.foreach(bench)
      case "d30dec" =>
        // decompose the gram-census family: where do d30's ~0.9s go?
        import org.apache.spark.sql.functions._
        import graft.functions.TextAnalysis
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        def t(name: String)(f: => Long): Unit = {
          val runs = (1 to 4).map { _ =>
            val t0 = System.nanoTime(); val r = f
            val s = (System.nanoTime() - t0) / 1e9; dropCaches(); (s, r)
          }
          println(f"DEC $name%-34s min=${runs.map(_._1).min}%7.3f rows=${runs.head._2}")
        }
        val toks = docs.select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("token"))
        t("scan+count docs")(docs.count())
        t("explode tokens count")(toks.count())
        t("tf groupBy (no persist)")(
          toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf")).count())
        t("tf persist+materialize") {
          val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val n = tf.count(); tf.unpersist(true); n
        }
        t("full d30")(TextAnalysis.unigramLogProb(docs, "doc_id", "text").count())
        t("full d36")(TextAnalysis.ngramLogProb(docs, "doc_id", "text", 2).count())
        // no-persist variant of the full pipeline: recompute tf per branch
        t("d30 sans persist") {
          val tf = toks.groupBy(col("doc_id"), col("token"))
            .agg(count(lit(1)).as("tf"))
          val freq = tf.groupBy("token").agg(sum("tf").cast("long").as("cnt"))
          val totals = freq.agg(sum("cnt").cast("long").as("total"),
            count(lit(1)).as("vocab"))
          val term = round(col("tf") *
            log((col("cnt") + 1) / (col("total") + col("vocab"))) * 1e6, 0)
            .cast("long")
          tf.join(freq, Seq("token"))
            .crossJoin(broadcast(totals))
            .groupBy(col("doc_id"))
            .agg(sum("tf").cast("long").as("n_tokens"),
              round(sum(term).cast("double") / 1e6 / sum("tf"), 6).as("logprob"))
            .count()
        }
      case "d30plan" =>
        import org.apache.spark.sql.functions._
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val toks = docs.select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("token"))
        val tf = toks.groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val freq = tf.groupBy("token").agg(sum("tf").cast("long").as("cnt"))
        val totals = freq.agg(sum("cnt").cast("long").as("total"),
          count(lit(1)).as("vocab"))
        val term = round(col("tf") *
          log((col("cnt") + 1) / (col("total") + col("vocab"))) * 1e6, 0)
          .cast("long")
        val out = tf.join(freq, Seq("token"))
          .crossJoin(broadcast(totals))
          .groupBy(col("doc_id"))
          .agg(sum("tf").cast("long").as("n_tokens"),
            round(sum(term).cast("double") / 1e6 / sum("tf"), 6).as("logprob"))
        out.count() // let AQE finalize
        val plan = out.queryExecution.executedPlan.toString
        val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
        val scans = plan.linesIterator.count(_.contains("Scan parquet"))
        println(s"PLAN reusedExchanges=$reused parquetScans=$scans")
        println(plan.linesIterator.filter(l =>
          l.contains("Exchange") || l.contains("Scan parquet")).mkString("\n"))
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
