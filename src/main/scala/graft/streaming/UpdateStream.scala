package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Telemetry.InstanceField

/** Structured Streaming ingestion for the field-update delta log.
  *
  * The reference is batch-only (SURVEY.md §2.9): its closest analogs are the
  * live/replay table pair (`SQL/GetMessage.sql:17-23`) and the batch Backup
  * compaction (`Java/.../Backup.java:40-61`). This module is the streaming
  * extension SURVEY.md §2.9 names: the same delta-log semantics computed
  * incrementally with `readStream` → transform → `writeStream`.
  *
  * All transforms here are source-agnostic — they accept a streaming OR
  * batch DataFrame with the `instance_field` / `instance_message` schema, so
  * the library's batch queries and the streaming path share one definition
  * of the semantics (tested both ways).
  *
  * Scale notes: `latestState` is a streaming shuffle keyed by the field key
  * — state is one row per (field, src, dst), bounded by the catalog size,
  * not the stream length. `updateRates` keeps per-window counts with a
  * watermark so state is dropped once the window closes. The stateful
  * variant (`latestStateTyped`) holds one small case-class per key in the
  * state store and emits only on change — the minimal-output form a
  * downstream incremental materialization wants.
  */
object UpdateStream {

  /** Latest value per field key — the streaming form of the batch argmax
    * (SURVEY.md §2.3 J6). In a stream this is an `update`-mode aggregation:
    * `max_by(struct, instance_message_id)` keeps exactly one row of state
    * per key, refreshed as updates arrive.
    */
  def latestState(updates: DataFrame): DataFrame =
    updates
      .groupBy(col("uevol_field_id"), col("src_id"), col("dst_id"))
      .agg(
        max(col("instance_message_id")).as("instance_message_id"),
        max_by(col("new_value"), col("instance_message_id")).as("value"))

  /** Per-window update rates with a watermark — the canonical streaming
    * windowed aggregation. `tsCol` must be a TimestampType event-time
    * column (epoch-ms longs go through `timestamp_millis` first).
    *
    * Append-mode emission contract (pinned by `StreamingSpec`): a window
    * `[start, end)` is emitted exactly when the event-time watermark
    * (max observed event time, floored to the millisecond, minus the
    * delay) reaches or passes `end` — i.e. `end <= watermark`. Windows
    * still inside the lateness horizon stay in the state store; a finite
    * replay therefore reports every window except the trailing
    * `delay + window` tail, which is exactly what the q42 driver oracle
    * replays batch-side.
    *
    * `keyCol` defaults to the message id (rate per message type); any
    * low-cardinality key column works — state is one count per
    * (window, key), dropped at window close.
    */
  def updateRates(updates: DataFrame, tsCol: String,
                  watermark: String = "10 minutes",
                  window: String = "1 minute",
                  keyCol: String = "uevol_message_id"): DataFrame =
    updates
      .withWatermark(tsCol, watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window).as("win"),
        col(keyCol))
      .agg(count(lit(1)).as("n_updates"))
      .select(col("win.start").as("window_start"),
        col("win.end").as("window_end"),
        col(keyCol), col("n_updates"))

  /** One state row per field key. */
  case class FieldState(
      uevol_field_id: Int, src_id: Int, dst_id: Int,
      instance_message_id: Long, value: Long)

  /** Stateful latest-value with change suppression: emits a row only when a
    * key's latest value actually changes (out-of-order updates below the
    * stored `instance_message_id` are absorbed silently). This is
    * `flatMapGroupsWithState` — the custom-state tool the built-in agg
    * can't express (emit-on-change), with state bounded at one
    * [[FieldState]] per live key.
    */
  def latestStateTyped(updates: Dataset[InstanceField]): Dataset[FieldState] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(u => (u.uevol_field_id, u.src_id, u.dst_id))
      .flatMapGroupsWithState[FieldState, FieldState](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case ((f, s, d), rows, state: GroupState[FieldState]) =>
          val incoming = rows.maxBy(_.instance_message_id)
          val prev = state.getOption
          if (prev.forall(_.instance_message_id < incoming.instance_message_id)) {
            val next = FieldState(f, s, d, incoming.instance_message_id, incoming.new_value)
            state.update(next)
            if (prev.forall(_.value != next.value)) Iterator(next) else Iterator.empty
          } else Iterator.empty
      }
  }

  /** Incremental compaction sink — the streaming form of the reference's
    * batch Backup job: each micro-batch lands in its own `batch=<id>`
    * partition directory, written with OVERWRITE so a replayed batch (the
    * at-least-once case `foreachBatch` allows after a failure between write
    * and checkpoint commit) rewrites the same directory instead of
    * duplicating rows — idempotent by construction. Within a batch, files
    * are further partitioned by `uevol_message_id` so downstream
    * point-in-time reads prune to one message's files;
    * `spark.read.parquet(path)` discovers both partition levels.
    */
  def compactionSink(updates: DataFrame, path: String, checkpoint: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite")
          .partitionBy("uevol_message_id")
          .parquet(s"$path/batch=$batchId")
      }
      .start()
}
