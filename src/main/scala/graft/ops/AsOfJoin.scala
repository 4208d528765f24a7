package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — the time-series operator Spark lacks natively: for
  * each left row, attach the value columns of the LATEST right row whose
  * time ≤ the left row's time, per join key (inclusive, like DuckDB's
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`).
  *
  * Scale shape: tag + union + ONE keyed window (a single shuffle on the
  * join keys, linear in |left| + |right|) — never the range cross join a
  * naive `l.t >= r.t` join plans, whose output is quadratic before its
  * per-key argmax. The same union-LOCF move the reconstruction family uses
  * (`SQL/GetMessage.sql`'s snapshot-vs-update lattice is an as-of join in
  * disguise).
  *
  * Contract: `valueCols` must be right-side-only names (absent from
  * `left`); right rows with NULL value columns do not overwrite earlier
  * state (LOCF semantics, per column). Right-side (key, time) duplicates
  * should be pre-aggregated by the caller for deterministic results.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           timeCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asOf needs at least one right value column")
    val collide = valueCols.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"valueCols collide with left columns: $collide")

    val l = left.withColumn("__is_left", lit(1))
    // a right row with no time can never satisfy "latest ≤ t" — dropping it
    // here keeps it from sorting nulls-first and bleeding into every match
    val r = right
      .where(col(timeCol).isNotNull)
      .select(((keys :+ timeCol) ++ valueCols).map(col): _*)
      .withColumn("__is_left", lit(0))
    // a right row at the SAME instant sorts before the left row → inclusive ≤
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.where(col("__is_left") === 1).drop("__is_left")
  }
}
