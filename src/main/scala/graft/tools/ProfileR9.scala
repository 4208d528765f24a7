package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Round-9 micro-profile: is `stripBoilerplate`'s twice-consumed exploded
  * frame worth a persist? The census branch and the anti-join branch both
  * descend from the same explode(reflow) — exchange reuse cannot dedup
  * them (different exchanges), so the reflow+explode runs twice unless
  * persisted. Measures both variants at sf0.1 and 10x, min-of-3 warm.
  */
object ProfileR9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val docs10 = (0 until 10).map { r =>
      docs1.select((col("doc_id") + lit(r * 10_000_000L)).as("doc_id"),
        concat(lit(s"r${r}x"), regexp_replace(col("text"), " ", s" r${r}x")).as("text"))
    }.reduce(_ unionByName _)

    def lines(d: DataFrame): DataFrame =
      d.select(col("doc_id"), TextAnalysis.reflowLines(col("text"), 12).as("lines"))

    def current(d: DataFrame): Long =
      TextAnalysis.stripBoilerplate(lines(d), "doc_id", "lines").count()

    def persisted(d: DataFrame): Long = {
      val exploded = lines(d)
        .select(col("doc_id"), posexplode_outer(col("lines")).as(Seq("pos", "line")))
        .where(col("line").isNotNull)
        .withColumn("__h", md5(col("line")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val census = exploded.groupBy("__h")
        .agg(countDistinct(col("doc_id")).as("__df"))
        .where(col("__df") > 1)
      val kept = exploded.join(census, Seq("__h"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("line")))).as("__k"))
        .select(col("doc_id"), size(col("__k")).cast("long").as("n_kept"))
      val n = lines(d).select(col("doc_id"))
        .join(kept, Seq("doc_id"), "left").count()
      exploded.unpersist(false)
      n
    }

    def minOf3(name: String)(f: => Long): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        val s = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        println(f"  $name%-22s ${s}%6.2f s rows=$n"); s
      }
      ts.min
    }
    current(docs1); persisted(docs1) // warm JIT
    spark.sharedState.cacheManager.clearCache()
    val c1 = minOf3("current x1")(current(docs1))
    val p1 = minOf3("persist x1")(persisted(docs1))
    val c10 = minOf3("current x10")(current(docs10))
    val p10 = minOf3("persist x10")(persisted(docs10))
    println(f"x1: current $c1%.2f vs persist $p1%.2f; x10: current $c10%.2f vs persist $p10%.2f")
    spark.stop()
  }
}
