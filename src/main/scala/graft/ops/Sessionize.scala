package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — a user's events split into sessions wherever
  * consecutive event times are more than `gapMinutes` apart.
  *
  * ONE shuffle+sort total: the gap flag (`lag`) and the running session
  * counter share a single (user, ts, event_id) window, and the per-session
  * aggregation's (user, session_idx) grouping is satisfied by the window's
  * hash-by-user partitioning, so EnsureRequirements inserts no second
  * Exchange (plan-asserted in DriverQueryPlanSpec). Session duration is
  * exact integer ns division, and `sum_value` sums on a 1e-6 integer grid
  * (round → long → sum → divide back, the unigramLogProb pattern) so the
  * partition-order-dependent FP addition a raw double sum would have
  * cannot land a rounding boundary differently than a sequential oracle.
  *
  * Streaming twin: [[graft.streaming.SessionStream.sessionize]] (same gap
  * rule, keyed state + event-time timeout).
  */
object Sessionize {

  /** @param events frame with `user_id`, `event_id`, `value` and a
    *               `tsNsCol` time column in any storage the events table
    *               ships (epoch-ns long, µs TIMESTAMP/_NTZ — normalized
    *               post-scan via [[graft.io.Tables.epochNs]]; sessionize
    *               has no time-bound filter, so nothing pushdown-relevant
    *               is lost)
    * @return one row per session: (user_id, session_idx, n_events,
    *         duration_s, sum_value), session_idx 1-based per user in time
    *         order
    */
  def rollup(events: DataFrame, gapMinutes: Int = 30,
             tsNsCol: String = "ts"): DataFrame = {
    require(gapMinutes > 0, s"gapMinutes=$gapMinutes must be positive")
    val w = Window.partitionBy("user_id").orderBy("__tsns", "event_id")
    val gapNs = gapMinutes * 60L * 1000000000L
    val prev = lag("__tsns", 1).over(w)
    events.select(col("user_id"), col("event_id"),
        graft.io.Tables.epochNs(events.schema(tsNsCol).dataType,
          col(tsNsCol)).as("__tsns"), col("value"))
      .withColumn("new_s",
        when(prev.isNull || col("__tsns") - prev > gapNs, 1).otherwise(0))
      .withColumn("session_idx", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        max("__tsns").as("__max_ts"), min("__tsns").as("__min_ts"),
        round(sum(round(col("value") * 1e6, 0).cast("long")).cast("double") / 1e6, 2)
          .as("sum_value"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        expr("(__max_ts - __min_ts) div 1000000000").as("duration_s"),
        col("sum_value"))
  }
}
