package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{JaccardJoin, MinHashLSH, SimHash, TextAnalysis}

/** Scale-up probe (dev tool): runs the corpus-heavy operators on the sf0.1
  * documents table and on a 10× replicated variant, and prints the wall
  * ratio. Every token is prefixed with a replica tag, so replicas share
  * ZERO shingles with each other or the original — the 10× corpus is
  * genuinely 10× distinct content, outputs scale exactly linearly, and a
  * wall ratio far above ~10× flags a plan that would not survive a real
  * scale-up. (An earlier filler-suffix variant left cross-replica Jaccard
  * above the near-dup thresholds and measured replication artifacts.)
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val n1 = docs1.count()
    val docs10 = (0 until 10).map { r =>
      val tag = s"r${r}x"
      docs1.select((col("doc_id") + lit(r * 10_000_000L)).as("doc_id"),
        concat(lit(tag), regexp_replace(col("text"), " ", " " + tag)).as("text"))
    }.reduce(_ unionByName _)

    def t(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s ${s}%7.2f s  rows=$rows")
      s
    }
    def suite(tag: String, d: DataFrame): Map[String, Double] = {
      println(s"--- $tag (${d.count()} docs) ---")
      val r = Map(
        "exact_dedup" -> t(s"$tag exact_dedup") {
          d.groupBy(TextAnalysis.fingerprintHex(col("text")).as("fp"))
            .agg(min("doc_id")).count() },
        "minhash_pairs" -> t(s"$tag minhash_pairs") {
          MinHashLSH.nearDupPairs(d, "doc_id", "text").count() },
        "simhash64_pairs" -> t(s"$tag simhash64_pairs") {
          SimHash.nearDupPairs64(d, "doc_id", "text").count() },
        "jaccard_join" -> t(s"$tag jaccard_join") {
          JaccardJoin.similarPairs(d, "doc_id", "text", 0.8).count() },
        "tfidf" -> t(s"$tag tfidf") {
          TextAnalysis.tfidfTopK(d, "doc_id", "text", 3).count() },
        "chunk" -> t(s"$tag chunk") {
          TextAnalysis.chunk(d, "doc_id", "text", 40, 8).count() })
      spark.sharedState.cacheManager.clearCache()
      r
    }
    suite("warmup", docs1) // JIT/codegen out of the comparison
    val s1 = suite("x1", docs1)
    val s10 = suite("x10", docs10)
    println(f"docs: $n1 -> ${n1 * 10}")
    s1.keys.toSeq.sorted.foreach { k =>
      println(f"$k%-18s x1=${s1(k)}%6.2f  x10=${s10(k)}%7.2f  ratio=${s10(k) / s1(k)}%5.1f") }
    spark.stop()
  }
}
