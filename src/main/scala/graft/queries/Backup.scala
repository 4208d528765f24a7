package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.ArgmaxLatest

/** Log compaction — `Java/.../Backup.java:40-61,65-104`.
  *
  * Everything before a log-time cutoff collapses to the latest update per
  * field; everything after is kept verbatim. The reference resolves the
  * unchanged-field set with a driver-side `collect()` into an `isin(...)`
  * and fetches each field's latest row through a per-row UDF running a
  * Dataset action (`Backup.java:76-90`) — local-mode-only mechanics. Here:
  * one anti-join + one max_by argmax, fully distributed.
  */
object Backup {

  /** @return compacted log: latest pre-cutoff row per field with no recent
    *         update, ∪ all rows from `logTimeLimit` on. Schema =
    *         `instanceField`'s.
    */
  def compact(
      instanceField: DataFrame,
      instanceMessage: DataFrame,
      uevolField: DataFrame,
      logTimeLimit: Long): DataFrame = {

    // Resolve the cutoff to an instance id (O(1) scalar, Backup.java:43-44).
    // Bound literal matched to the log_time storage type (Tables.tsLit)
    // so the predicate pushes into the scan.
    val idLimit = Option(
      instanceMessage.where(col("log_time") >= graft.io.Tables.tsLit(
          instanceMessage.schema("log_time").dataType, logTimeLimit))
        .agg(min("id")).head().get(0))
      .map(_.asInstanceOf[Number].longValue)
      .getOrElse(Long.MaxValue)

    val recent = instanceField.where(col("instance_message_id") >= idLimit)

    // Fields untouched since the cutoff (Backup.java:48-51's NOT isin,
    // as an anti-join so the list never rides through the driver).
    val unchangedFieldIds = uevolField.select(col("id").as("uevol_field_id"))
      .join(recent.select("uevol_field_id").distinct(), Seq("uevol_field_id"), "left_anti")

    // Latest pre-cutoff row per unchanged field (Backup.java:76-90's UDF
    // as a single argmax aggregation).
    val older = ArgmaxLatest.latestRows(
      instanceField
        .where(col("instance_message_id") < idLimit)
        .join(broadcast(unchangedFieldIds), Seq("uevol_field_id"), "left_semi"),
      Seq("uevol_field_id"),
      col("instance_message_id"))

    older.select(instanceField.columns.toIndexedSeq.map(col): _*)
      .unionByName(recent)
  }
}
