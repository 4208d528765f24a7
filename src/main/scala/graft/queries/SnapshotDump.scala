package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{ArgmaxLatest, SnapshotJson}

/** Periodic snapshot PRODUCTION — the write side of [[MessageReconstruct]]'s
  * bracket read. The reference consumes snapshot tables
  * (`SQL/GetMessage.sql:63-101`) that an out-of-band dumper produces; here
  * the dump is the engine's own plan: per-(field, src, dst, path) argmax of
  * the delta log at the snapshot instant (one partial-agg shuffle — the
  * same shape as reconstruction), rendered back into nested `json_value`
  * rows by [[SnapshotJson.render]]. `flatten(dump(log, at))` is exactly the
  * state at `at` — the round-trip property the spec pins.
  */
object SnapshotDump {

  /** Snapshot rows (uevol_field_id, src_id, dst_id, instance_message_id=at,
    * json_value) for the whole log state at instance `at`.
    */
  def dump(instanceField: DataFrame, at: Long): DataFrame = {
    val key = Seq("uevol_field_id", "src_id", "dst_id")
    val latest = ArgmaxLatest.latestRows(
      instanceField.where(col("instance_message_id") <= at)
        .select((key :+ "relative_path" :+ "instance_message_id" :+ "new_value").map(col): _*),
      key :+ "relative_path",
      col("instance_message_id"))
      .select(col("uevol_field_id"), col("src_id"), col("dst_id"),
        col("relative_path"), col("new_value").cast("double").as("value"))
    SnapshotJson.render(latest, key)
      .withColumn("instance_message_id", lit(at))
      .select("uevol_field_id", "src_id", "dst_id", "instance_message_id",
        "json_value")
  }
}
