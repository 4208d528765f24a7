package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the incremental twin of the batch
  * `q39_sessionize` rollup (same rule: a gap over `gapMinutes` of event
  * time closes a user's session).
  *
  * This is the canonical `flatMapGroupsWithState` + `EventTimeTimeout`
  * pattern: one small [[SessionStream.SessionAgg]] per LIVE user in the
  * state store (bounded by concurrent users, not stream length), sessions
  * emitted exactly when they close — either an in-order event arrives past
  * the gap, or the watermark passes the session's timeout (the user went
  * quiet). Append output mode: a session row is final when emitted.
  *
  * The batch window variant cannot express this incrementally — a
  * running-sum window over an unbounded stream would need the whole
  * history; the keyed state holds only (start, last, n, sum) per user.
  */
object SessionStream {

  /** Open-session state per user (epoch-ms event times). `sumMicros`
    * accumulates `value` on the same 1e-6 integer grid the batch rollup
    * sums on (`Sessionize.rollup`'s `round(value*1e6) → long` pattern):
    * integer addition is order-independent, so batch/stream parity on
    * `sum_value` cannot drift at a 2-decimal rounding boundary the way
    * arrival-order-dependent raw double accumulation could.
    */
  case class SessionAgg(startMs: Long, lastMs: Long,
                        nEvents: Long, sumMicros: Long)

  /** A closed session. `duration_s` is exact integer seconds. */
  case class SessionOut(user_id: Long, n_events: Long,
                        duration_s: Long, sum_value: Double)

  /** @param events streaming (or batch-test) frame with `user_id`,
    *               an event-time `ts` (TimestampType) and `value`
    * @param watermark how much event-time lateness to absorb; also gates
    *                  when quiet-user sessions time out and emit
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 watermark: String = "10 minutes"): Dataset[SessionOut] = {
    require(gapMinutes > 0, s"gapMinutes=$gapMinutes must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60_000L

    // Spark's round() is BigDecimal HALF_UP; replay it exactly on both the
    // per-event grid snap and the 2-decimal emit so a value like x.005
    // lands on the same side as the batch plan's round(value*1e6)/1e6.
    def micros(v: Double): Long =
      java.math.BigDecimal.valueOf(v * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

    def close(uid: Long, s: SessionAgg): SessionOut =
      SessionOut(uid, s.nEvents, (s.lastMs - s.startMs) / 1000L,
        java.math.BigDecimal.valueOf(s.sumMicros / 1e6)
          .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue())

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAgg, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            // watermark passed last event + gap: the session is closed by
            // silence; emit it and drop the state row
            val done = close(uid, state.get)
            state.remove()
            Iterator.single(done)
          } else {
            // fold this micro-batch's rows in event-time order, closing a
            // session whenever the gap rule fires inside the batch. The
            // buffer-and-sort holds ONE user's slice of ONE micro-batch —
            // memory is bounded by (batch rows / active users), a trigger-
            // interval knob, never by stream length or session length.
            val out = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, v) =>
              val t = ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  // min on start: a late event (within watermark + gap) may
                  // carry a time EARLIER than the recorded session start —
                  // the session began then, and duration must say so
                  cur = Some(SessionAgg(math.min(s.startMs, t),
                    math.max(s.lastMs, t), s.nEvents + 1, s.sumMicros + micros(v)))
                case Some(s) =>
                  out += close(uid, s)
                  cur = Some(SessionAgg(t, t, 1L, micros(v)))
                case None =>
                  cur = Some(SessionAgg(t, t, 1L, micros(v)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            out.result().iterator
          }
      }
  }
}
