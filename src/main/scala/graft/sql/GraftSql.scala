package graft.sql

import org.apache.spark.sql.SparkSession

import graft.io.Tables
import graft.plans.VectorExpressions

/** SQL surface (SURVEY.md §7.1 `sql/`): make the whole catalog and the
  * native functions reachable from `spark.sql("...")` — temp views for
  * every testdata table plus the `graft_dot` expression. Idempotent.
  */
object GraftSql {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }
    // events via the raw-ns scan so SQL-level ts predicates stay pushable
    Tables.loadEventsRaw(spark, dir).createOrReplaceTempView("events")
    VectorExpressions.ensureRegistered(spark)
    registerDocViews(spark)
  }

  /** SQL-surface views over the text-analysis columns: the pipeline scores
    * as plain `spark.sql` targets (`SELECT * FROM documents_scored WHERE
    * quality >= 0.3 AND lang_pred = 'en'`). Views stay lazy projections —
    * codegen'd column math over the base scan, no UDFs, filters still push
    * through to parquet.
    */
  def registerDocViews(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.col
    import graft.functions.{Sampling, TextAnalysis}
    if (spark.catalog.tableExists("documents")) {
      spark.table("documents")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .withColumn("n_subwords", TextAnalysis.subwordCount(col("text")))
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .withColumn("lang_pred", TextAnalysis.langId(col("text")))
        .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
        .withColumn("split", Sampling.hashSplit(col("doc_id"),
          Seq("train" -> 8, "val" -> 1, "test" -> 1)))
        .createOrReplaceTempView("documents_scored")
    }
  }
}
