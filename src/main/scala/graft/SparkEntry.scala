package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.testqueries.{EventQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator family from SURVEY.md §2
  * over the driver's testdata; `oracleSql` holds the DuckDB-equivalent SQL
  * the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Point-in-time state reconstruction — the reference's core capability
    * (GetMessage / RetrieveMessage, SURVEY.md §2.10).
    */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.queries("q17_reconstruct_state")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ EventQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ EventQueries.oracles ++ PipelineQueries.oracles
}
