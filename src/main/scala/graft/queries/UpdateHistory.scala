package graft.queries

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.ops.Locf

/** Value-over-time history for a set of argument triples —
  * `SQL/GetUpdateHistory.sql:8-252`.
  *
  * The reference builds a dynamic-width pivot table (one BIGINT column per
  * triple, named `id{f}_src{s}_dst{d}`, :36-78), seeds it with the state at
  * window start (via GetMultipleFieldsHistory, :29,80-97), then row-cursors
  * through events copying the previous row forward (:136-177), and finally
  * rewrites per-field filter strings — `value` is a placeholder for the
  * pivot column — into one AND-composed WHERE (:180-233).
  *
  * Spark-first shape: a (grid × key) long-format LOCF — window partitioned
  * BY KEY (scales with #keys × #events, no global single-partition window) —
  * then one pivot to the wide parity layout, then `expr(rewrittenFilter)`.
  */
object UpdateHistory {

  /** Pivot column name for a triple (GetUpdateHistory.sql:36). */
  def colName(f: Int, s: Int, d: Int): String = s"id${f}_src${s}_dst$d"

  /** @param args        (uevol_field_id, src_id, dst_id, filter) — `filter`
    *                    may be "" or e.g. "value > 5" (placeholder rewritten)
    * @param startState  (uevol_field_id, src_id, dst_id, value) at window
    *                    start — from [[MultipleFields.getMultipleFields]]
    *                    (scalar paths), the reference's start_table
    * @param startId/endId window bounds on instance_message_id
    * @return wide rows: (instance_message_id, id{f}_src{s}_dst{d}...), the
    *         seed row at startId first, LOCF-filled, filter-applied
    */
  def updateHistory(
      instanceField: DataFrame,
      args: DataFrame,
      startState: DataFrame,
      startId: Long,
      endId: Long): DataFrame = {

    val spark = instanceField.sparkSession
    val key = Seq("uevol_field_id", "src_id", "dst_id")
    val argRows: Array[Row] = args.select(
      col("uevol_field_id").cast("int"), col("src_id").cast("int"),
      col("dst_id").cast("int"), col("filter")).collect()
    val names = argRows.map(r => colName(r.getInt(0), r.getInt(1), r.getInt(2))).toSeq

    val keyCol = concat(lit("id"), col("uevol_field_id"),
      lit("_src"), col("src_id"), lit("_dst"), col("dst_id"))

    // Events in window, restricted to the argument triples (broadcast).
    val argKeys = broadcast(args.select(key.map(col): _*).distinct())
    val events = instanceField
      .where(col("instance_message_id").between(startId, endId))
      .join(argKeys, key, "left_semi")
      .select(col("instance_message_id"), keyCol.as("k"),
        col("new_value").cast("long").as("v"))

    // Seed: the state at window start as synthetic events at startId
    // (GetUpdateHistory.sql:80-97). Null start values stay null (the
    // reference leaves unset columns NULL in the seed row).
    val seed = startState
      .join(argKeys, key, "left_semi")
      .select(lit(startId).as("instance_message_id"), keyCol.as("k"),
        col("value").cast("long").as("v"))

    // Grid = every (event instance id × key): long-format LOCF partitioned
    // by key, then pivot back to the reference's wide layout.
    val ids = events.select("instance_message_id").distinct()
      .unionByName(spark.range(1).select(lit(startId).as("instance_message_id")))
      .distinct()
    val keys = args.select(keyCol.as("k")).distinct()
    val grid = ids.crossJoin(broadcast(keys))

    val longFmt = grid
      .join(seed.unionByName(events)
        .groupBy("instance_message_id", "k").agg(max("v").as("v")),
        Seq("instance_message_id", "k"), "left_outer")
    val filled = Locf.fill(longFmt, Seq("k"), Seq(col("instance_message_id")), Seq("v"))

    val wide = filled
      .groupBy("instance_message_id")
      .pivot("k", names)
      .agg(first("v"))

    // Filter rewrite: each non-empty filter string has its `value`
    // placeholder replaced by the pivot column name; AND-composed
    // (GetUpdateHistory.sql:212-224).
    val conds = argRows.toSeq
      .filter(r => r.getString(3) != null && r.getString(3).nonEmpty)
      .map { r =>
        val cn = colName(r.getInt(0), r.getInt(1), r.getInt(2))
        expr(r.getString(3).replace("value", cn))
      }
    conds.reduceOption(_ && _) match {
      case Some(c) => wide.where(c).orderBy("instance_message_id")
      case None => wide.orderBy("instance_message_id")
    }
  }
}
