package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.MinHashLSH

/** Scratch profiler for the d22 prefix-filtering stages (dev only). */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"$name: ${(System.nanoTime() - t0) / 1e9}"); r
    }
    val threshold = 0.5
    val sh = MinHashLSH.shingleArrays(docs, "doc_id", "text", 3).persist()
    t("shingleArrays")(sh.count())
    val toks = sh.select(col("doc_id"), size(col("sh_arr")).as("sz"),
      explode(col("sh_arr")).as("sh"))
    t("toks")(toks.count())
    val freq = toks.groupBy("sh").agg(count(lit(1)).as("df"))
    t("freq")(freq.count())
    val prefix = toks.join(freq, "sh")
      .withColumn("r", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
      .where(col("r") <= col("sz") - ceil(col("sz") * threshold) + 1)
      .select(col("doc_id"), col("sz"), col("sh")).persist()
    t("prefix")(println("prefix rows: " + prefix.count()))
    val cand = prefix.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("sh"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"), col("sh")),
        Seq("sh"))
      .where(col("doc_a") < col("doc_b") &&
        col("sz_b") >= ceil(col("sz_a") * threshold) &&
        col("sz_a") >= ceil(col("sz_b") * threshold))
      .select("doc_a", "doc_b")
    t("cand-raw")(println("cand raw: " + cand.count()))
    val candD = cand.distinct().persist()
    t("cand-distinct")(println("cand: " + candD.count()))
    t("verify")(println("pairs: " + MinHashLSH.jaccard(candD, sh, "doc_id")
      .where(col("jaccard") >= threshold).count()))
    spark.stop()
  }
}
