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
  }
}
