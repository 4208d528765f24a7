package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion — "which users did A, then B, then C" — the
  * event-analytics counterpart of sessionization: each step must occur at
  * or after the EARLIEST valid occurrence of the previous step.
  *
  * Computation: one partition per key, then k sequential window-min
  * projections over the SAME partitioning — step i's candidate timestamps
  * are gated on the partition-constant step-(i−1) time from the previous
  * projection, so `t_i = min{ts : type = s_i ∧ ts ≥ t_{i−1}}`. This is the
  * earliest-completion funnel (greedy is optimal here: taking the
  * earliest valid occurrence of each step never forecloses a later step,
  * since any later completion of step i admits a superset of nothing —
  * every event usable with the later t_i is also usable with the earlier
  * one).
  *
  * Scale shape: ONE exchange on the key; the k window passes reuse the
  * partitioning (no further shuffle), and the input is pre-filtered to
  * funnel-step events only, so the window frames carry the funnel slice,
  * not the corpus. Ties (a step at exactly the previous step's instant)
  * count — simultaneous events in one logged batch are a real pattern;
  * the `>=` gate is the documented contract, replayed by the oracle.
  *
  * Output, one row per key that has ≥1 funnel event: `steps_reached`
  * (0..k), `converted` (1/0), per-step first-completion epochs
  * (−1 sentinel where never reached), and the total conversion lag.
  */
object Funnel {

  def conversion(df: DataFrame, keyCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct, got $steps")
    val w = Window.partitionBy(col(keyCol))
    var cur = df.where(col(typeCol).isin(steps: _*))
      .select(col(keyCol), col(tsCol).cast("long").as("__t"), col(typeCol))
    steps.zipWithIndex.foreach { case (s, i) =>
      val cond = if (i == 0) col(typeCol) === s
      else col(typeCol) === s && col("__t") >= col(s"__s${i - 1}")
      cur = cur.withColumn(s"__s$i", min(when(cond, col("__t"))).over(w))
    }
    val k = steps.length
    val stepAggs = steps.indices.map(i =>
      coalesce(max(col(s"__s$i")), lit(-1L)).as(s"t_step${i + 1}"))
    // ascending fold → the HIGHEST completed step is the outermost branch
    val reached = (0 until k).foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t_step${i + 1}") =!= -1L, lit(i + 1)).otherwise(acc)
    }
    cur.groupBy(col(keyCol))
      .agg(stepAggs.head, stepAggs.tail: _*)
      .withColumn("steps_reached", reached)
      .withColumn("converted",
        (col(s"t_step$k") =!= -1L).cast("int"))
      .withColumn("conv_lag",
        when(col(s"t_step$k") =!= -1L, col(s"t_step$k") - col("t_step1"))
          .otherwise(lit(-1L)))
  }
}
