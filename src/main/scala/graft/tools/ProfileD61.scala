package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Sampling

/** Round-10 follow-up to the q43 adjudication: is dsirLogRatio's
  * docCensus persist (TextAnalysis.scala) also removable? Its two
  * consumers — the rawCensus→ratio broadcast branch and the final
  * per-doc join — both contain the identical (doc, bucket) census
  * exchange, so ReuseExchange may serve the second read from shuffle
  * files, making the persist pure cache-fill overhead like q43's (where
  * instead Catalyst pruned the inner agg). Unlike q43 the inner
  * aggregate CANNOT be pruned (the outer sums the non-grouping `f`), so
  * the question is purely exchange reuse across a broadcast boundary —
  * which crosses a JOB boundary (the broadcast subquery executes as its
  * own job), where exchange reuse historically does not apply. Measure,
  * don't guess: persisted vs unpersisted d61 and d62 shapes at
  * driver-bench conditions, sf0.1 and a 10x replication.
  */
object ProfileD61 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "lang", "text")
    val docs10 = (0 until 10).map { r =>
      docs1.select((col("doc_id") + lit(r * 10_000_000L)).as("doc_id"),
        col("lang"),
        concat(lit(s"r$r "), col("text")).as("text"))
    }.reduce(_ unionByName _)

    def logRatioNoPersist(raw: DataFrame, target: DataFrame,
                          buckets: Int = 1024): DataFrame = {
      val s = raw.sparkSession
      def sh(n: Int) = graft.plans.TextExpressions.shinglesColumn(
        s, col("__w"), n)
      def bucketed(d: DataFrame, keep: Seq[String]) = d
        .select(keep.map(col) :+ split(lower(col("text")), " ").as("__w"): _*)
        .select(keep.map(col) :+
          explode_outer(concat(sh(1), sh(2))).as("__h"): _*)
        .select(keep.map(col) :+
          pmod(col("__h"), lit(buckets.toLong)).as("bucket"): _*)
      val docCensus = bucketed(raw, Seq("doc_id"))
        .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("f"))
      val rawCensus = docCensus.groupBy("bucket")
        .agg(sum("f").cast("long").as("cr"))
      val tgtCensus = bucketed(target, Seq.empty)
        .groupBy("bucket").agg(count(lit(1)).cast("long").as("ct"))
      val rawTot = rawCensus.agg(sum("cr").cast("long").as("tr"))
      val tgtTot = tgtCensus.agg(sum("ct").cast("long").as("tt"))
      val ratio = rawCensus
        .join(tgtCensus, Seq("bucket"), "left")
        .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
        .select(col("bucket"),
          (log((coalesce(col("ct"), lit(0L)) + 1) / (col("tt") + buckets)) -
            log((col("cr") + 1) / (col("tr") + buckets))).as("lnr"))
      val term = round(col("f") * col("lnr") * 1e6, 0).cast("long")
      docCensus.join(broadcast(ratio), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(sum("f").cast("long").as("n_feats"),
          round(sum(term).cast("double") / 1e6, 6).as("logw"))
    }

    def dropCaches(): Unit = {
      graft.CacheRegistry.releaseAll()
      spark.sharedState.cacheManager.clearCache()
    }
    def time(name: String, n: Int = 4)(f: => Long): Double = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); val r = f
        val sdt = (System.nanoTime() - t0) / 1e9
        dropCaches()
        println(f"  $name%-26s ${sdt}%6.2f s rows=$r"); sdt
      }
      println(f"  $name%-26s min=${ts.min}%6.2f"); ts.min
    }

    docs1.count(); docs10.count() // warm

    def tgt(d: DataFrame) = d.where(col("lang") === "en")
    val p1 = time("persist d61 x1") {
      graft.functions.TextAnalysis
        .dsirLogRatio(docs1, tgt(docs1), "doc_id", "text", 1024).count()
    }
    val n1 = time("nopersist d61 x1") {
      logRatioNoPersist(docs1, tgt(docs1)).count()
    }
    val p62 = time("persist d62 x1") {
      graft.functions.TextAnalysis
        .dsirTopK(docs1, tgt(docs1), "doc_id", "text", 100, 1024).count()
    }
    val n62 = time("nopersist d62 x1") {
      val u = (Sampling.hashValue(col("doc_id")) + 0.5) / 4294967296.0
      logRatioNoPersist(docs1, tgt(docs1))
        .withColumn("key", round(col("logw") - log(-log(u)), 6))
        .orderBy(col("key").desc, col("doc_id")).limit(100).count()
    }
    val p10 = time("persist d61 x10", 3) {
      graft.functions.TextAnalysis
        .dsirLogRatio(docs10, tgt(docs10), "doc_id", "text", 1024).count()
    }
    val n10 = time("nopersist d61 x10", 3) {
      logRatioNoPersist(docs10, tgt(docs10)).count()
    }
    println(f"x1 d61: persist $p1%.2f vs none $n1%.2f; x1 d62: persist $p62%.2f vs none $n62%.2f; x10 d61: persist $p10%.2f vs none $n10%.2f")
    spark.stop()
  }
}
