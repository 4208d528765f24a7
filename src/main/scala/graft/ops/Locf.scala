package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** LOCF forward-fill over ordered per-key history — SURVEY.md §2.5 W6.
  *
  * The reference does this with a row-cursor WHILE loop that copies the
  * previous row then applies the current event's updates
  * (`SQL/GetUpdateHistory.sql:136-177`) — O(rows) driver round-trips. The
  * Spark-native shape is `last(col, ignoreNulls = true)` over an
  * unbounded-preceding window: one shuffle on the partition keys, one sort,
  * all columns filled in the same window pass.
  */
object Locf {

  def fill(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[Column], fillCols: Seq[String]): DataFrame = {
    val w = Window
      .partitionBy(partitionBy.map(col): _*)
      .orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
