package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off forensic: does the exact 13-gram screen's wall actually track
  * corpus gram volume at sf0.1 scale? (Supports the SCALE.md release-screen
  * note.)
  */
object ProbeScreen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val corpus10 = docs1.unionByName((1 until 10).map { r =>
      val tag = s"r${r}x"
      docs1.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        concat(lit(tag), regexp_replace(col("text"), " ", " " + tag)).as("text"))
    }.reduce(_ unionByName _))
    val bench = docs1.where(col("doc_id") % 100 === 0)
      .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
    def t(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$r")
    }
    t("grams 1x distinct")(graft.functions.MinHashLSH
      .shingles(docs1, "doc_id", "text", 13).select("sh").distinct().count())
    t("grams 10x distinct")(graft.functions.MinHashLSH
      .shingles(corpus10, "doc_id", "text", 13).select("sh").distinct().count())
    for (i <- 1 to 3) {
      t(s"screen 1x #$i") {
        val n = graft.functions.TextAnalysis
          .ngramContamination(bench, docs1, "doc_id", "text").count()
        graft.CacheRegistry.releaseAll(); n
      }
      t(s"screen 10x #$i") {
        val n = graft.functions.TextAnalysis
          .ngramContamination(bench, corpus10, "doc_id", "text").count()
        graft.CacheRegistry.releaseAll(); n
      }
    }
    spark.stop()
  }
}
