package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Sampling, TextAnalysis}

/** Round-10 micro-profile of the d62_dsir_topk regression under DRIVER
  * bench conditions (local[4], shuffle.partitions=4, AQE on — Bench.scala
  * defaults, NOT the local[32] the in-session measurements used): d61
  * (dsirLogRatio) sits on its 1.3s floor while d62 (same subplan + Gumbel
  * orderBy().limit(100)) posts 8.3s min-of-4. Decomposes d62 into
  * candidate causes: the TakeOrderedAndProject consumer, the md5 Gumbel
  * key, and aggregate-pruning (d61's count() lets Catalyst drop the
  * sum(term) aggregates + the ratio join inputs; d62's sort key forces
  * them).
  */
object ProfileR10 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val tgt = docs.where(col("lang") === "en")

    def dropCaches(): Unit = {
      graft.CacheRegistry.releaseAll()
      spark.sharedState.cacheManager.clearCache()
    }
    def time(name: String, n: Int = 4)(f: => Long): Double = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); val r = f
        val s = (System.nanoTime() - t0) / 1e9
        dropCaches()
        println(f"  $name%-28s ${s}%6.2f s rows=$r"); s
      }
      println(f"  $name%-28s min=${ts.min}%6.2f"); ts.min
    }

    // warm up
    docs.count(); tgt.count()

    val d61 = time("d61 logRatio.count") {
      TextAnalysis.dsirLogRatio(docs, tgt, "doc_id", "text", 1024).count()
    }
    val d61full = time("d61 forced (sum logw)") {
      TextAnalysis.dsirLogRatio(docs, tgt, "doc_id", "text", 1024)
        .agg(sum("logw")).collect(); 1L
    }
    val d62 = time("d62 topK.count") {
      TextAnalysis.dsirTopK(docs, tgt, "doc_id", "text", 100, 1024).count()
    }
    val noGumbel = time("d62 sans gumbel") {
      TextAnalysis.dsirLogRatio(docs, tgt, "doc_id", "text", 1024)
        .orderBy(col("logw").desc, col("doc_id")).limit(100).count()
    }
    val noLimit = time("d62 gumbel, no limit") {
      val u = (Sampling.hashValue(col("doc_id")) + 0.5) / 4294967296.0
      TextAnalysis.dsirLogRatio(docs, tgt, "doc_id", "text", 1024)
        .withColumn("key", round(col("logw") - log(-log(u)), 6))
        .agg(sum("key")).collect(); 1L
    }
    println(f"d61=$d61%.2f d61full=$d61full%.2f d62=$d62%.2f noGumbel=$noGumbel%.2f noLimit=$noLimit%.2f")
    spark.stop()
  }
}
