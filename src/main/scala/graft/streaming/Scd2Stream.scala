package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Scd2.fromLog]]: change events arrive on a
  * stream and leave as CLOSED `[eff_from, eff_to)` intervals the moment
  * the closing change is seen — the live feed a slowly-changing-dimension
  * table tails. The still-open interval per key lives in state (exactly
  * one [[Scd2Stream.St]] per live key — the `latestStateTyped` budget
  * class) and is never emitted, matching the batch side's open-tail
  * sentinel row being the ONLY difference between the two outputs: on a
  * finite replay, stream output == batch `fromLog` minus its open rows —
  * the parity q47 gates against the oracle.
  *
  * Within a micro-batch, a group's rows are folded in (t, ord) order;
  * ACROSS batches a row older than the key's last applied (t, ord) is
  * late-after-state and dropped (the same contract as `latestStateTyped`,
  * which ignores stale instance ids — reordering history after an
  * interval closed would mean retracting emitted rows, which append-mode
  * consumers cannot do). Feed a watermark-sorted source if cross-batch
  * order matters.
  */
object Scd2Stream {

  /** One change observation: (key, event time µs, tie-break, value). */
  case class Change(key: Long, t: Long, ord: Long, v: String)

  /** A closed interval: `v` held over `[eff_from, eff_to)`. */
  case class Interval(key: Long, v: String, eff_from: Long, eff_to: Long)

  /** Per-key open interval: current value + its start, and the last
    * applied (t, ord) for the late-row guard.
    */
  case class St(v: String, from: Long, lastT: Long, lastOrd: Long)

  def intervals(changes: Dataset[Change]): Dataset[Interval] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState[St, Interval](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[St]) =>
          val sorted = rows.toSeq.sortBy(c => (c.t, c.ord))
          val out = Seq.newBuilder[Interval]
          var st = state.getOption.orNull
          sorted.foreach { c =>
            if (st == null) {
              st = St(c.v, c.t, c.t, c.ord)
            } else if (c.t > st.lastT || (c.t == st.lastT && c.ord > st.lastOrd)) {
              if (c.v != st.v) {
                out += Interval(key, st.v, st.from, c.t)
                st = St(c.v, c.t, c.t, c.ord)
              } else {
                st = st.copy(lastT = c.t, lastOrd = c.ord)
              }
            } // else: late-after-state, dropped (documented contract)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }
}
