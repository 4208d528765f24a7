package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.MinHashLSH

/** Scratch profiler for the minhash pipeline stages (dev only). */
object ProfileMinhash {
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
    val sh = MinHashLSH.shingleArrays(docs, "doc_id", "text", 3).persist()
    t("shingleArrays")(sh.count())
    val sig = MinHashLSH.signatureArray(sh, "doc_id", 8)
    t("signature")(sig.count())
    val bands = MinHashLSH.bands(sig, "doc_id", 8, 2)
    t("bands")(bands.count())
    val cand = MinHashLSH.candidates(bands, "doc_id")
    t("candidates")(cand.count())
    val jac = MinHashLSH.jaccard(cand, sh, "doc_id")
    t("jaccard")(jac.count())
    spark.stop()
  }
}
