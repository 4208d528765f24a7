package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{MinHashLSH, TextAnalysis}
import graft.io.Tables

/** Scratch profiler for the d19 slowdown: times the pipeline variants. */
object ProfileD19 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
      spark.sharedState.cacheManager.clearCache()
    }

    def d = Tables.load(spark, dir, "documents")

    def core(main: DataFrame, extraGate: org.apache.spark.sql.Column,
             selectLang: Boolean): DataFrame = {
      val exactCanon = d
        .groupBy(TextAnalysis.fingerprintHex(col("text")).as("fp_hex"))
        .agg(min("doc_id").as("exact_canon"))
      val pairs = MinHashLSH.nearDupPairs(d, "doc_id", "text")
        .where(col("jaccard") >= 0.5)
      val clusterOf = MinHashLSH.clusters(pairs)
        .select(col("id").as("doc_id"), col("cluster"))
      val base = main
        .join(exactCanon, "fp_hex")
        .join(clusterOf, Seq("doc_id"), "left_outer")
        .where(col("doc_id") === col("exact_canon") &&
          (col("cluster").isNull || col("cluster") === col("doc_id")) &&
          TextAnalysis.qualityScore(col("text")) >= 0.3 && extraGate)
      if (selectLang)
        base.select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
      else
        base.select(col("doc_id"),
          TextAnalysis.langIdHeuristic(col("text")).as("lang_pred"))
    }

    val plain = d.withColumn("fp_hex", TextAnalysis.fingerprintHex(col("text")))
    def withRep = TextAnalysis.repetitionRatio(plain, "doc_id", "text")

    t("A: d14 shape")(core(plain, lit(true), selectLang = false).count())
    t("B: + rep gate")(core(withRep, col("rep_ratio") <= 0.05, selectLang = false).count())
    t("C: + langId select")(core(plain, lit(true), selectLang = true).count())
    t("D: full d19")(core(withRep, col("rep_ratio") <= 0.05, selectLang = true).count())
    spark.stop()
  }
}
