package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Telemetry.SnapshotRef

/** Nearest-snapshot resolution (SURVEY.md §2.4 A7).
  *
  * snap_min = the snapshot with the greatest start ≤ target;
  * snap_max = the snapshot with the smallest start ≥ target — STRICTLY >
  * when target == 0 (the reference's boundary asymmetry,
  * `SQL/GetMessage.sql:74-86`), so that target 0 still brackets an epoch.
  *
  * The snapshots catalog is tiny (one row per periodic dump), so this is one
  * of the two legitimate driver-side collects in the engine (SURVEY.md §7.5
  * risk 5): an O(1) aggregate steering which snapshot tables the distributed
  * plan scans — the partition-pruning analog.
  */
object SnapshotBracket {

  /** Returns (snapMin, snapMax). snapMin is absent when no snapshot starts
    * at or before the target; snapMax falls back to snapMin when the target
    * lies beyond the last snapshot — the reference's degenerate
    * `snap_min == snap_max` branch (`SQL/GetMessage.sql:611-990`), where the
    * epoch is open-ended and change detection is skipped.
    */
  def bracket(catalog: DataFrame, target: Long): (Option[SnapshotRef], Option[SnapshotRef]) = {
    val rows = catalog
      .select(col("name"), col("start_instance_message_id").cast("long"))
      .collect()
      .map(r => SnapshotRef(r.getString(0), r.getLong(1)))
    val snapMin = rows.filter(_.start_instance_message_id <= target)
      .sortBy(_.start_instance_message_id).lastOption
    val maxSide =
      if (target == 0L) rows.filter(_.start_instance_message_id > target)
      else rows.filter(_.start_instance_message_id >= target)
    val snapMax = maxSide.sortBy(_.start_instance_message_id).headOption
    (snapMin, snapMax.orElse(snapMin))
  }
}
