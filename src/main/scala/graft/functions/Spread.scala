package graft.functions

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for CPU-heavy per-row stages (optimization guide
  * §2.5, "input skew: one huge unsplittable file — repartition immediately
  * after the read").
  *
  * A parquet scan cannot split below row-group granularity, so a source
  * written as ONE row group plans ONE task regardless of the session's
  * core count — and a genuinely expensive per-row stage downstream (a
  * codec encode/decode, the BPE merge fold) then serializes on one core
  * while the rest idle. [[toCores]] spreads such a narrow scan round-robin
  * across the session's default parallelism BEFORE the heavy stage.
  *
  * Why this is scale-correct and not a local-mode tune: the spread only
  * fires when the planned scan parallelism is BELOW the session's core
  * count. Any real corpus at scale plans orders of magnitude more scan
  * partitions than one machine has cores, so there the helper is the
  * IDENTITY — no exchange enters the plan, nothing is pessimized. Where it
  * does fire, the exchange carries exactly the narrow pre-stage rows the
  * caller passes (ids, or id+text), never derived payloads. Row-to-
  * partition assignment under round-robin is deterministic across retries
  * because Spark sorts before repartitioning (SPARK-23207, on by default),
  * and every caller is set-oriented downstream, so results are identical
  * either way.
  *
  * CONTRACT: apply to SCAN-ROOTED frames only (a scan plus narrow
  * projections/filters). Probing the planned partition count goes through
  * `df.rdd`, and on a frame with upstream exchanges AQE materializes those
  * stages eagerly at that point — harmless for correctness, but it would
  * run jobs at plan-construction time. Streaming frames pass through
  * untouched (micro-batch partitioning is the runner's concern, and
  * `.rdd` is illegal on them).
  */
object Spread {

  /** Operational escape hatch (and the A/B toggle ProfileR19's
    * interleaved-arm harness flips): `false` makes both entry points the
    * identity. Session-scoped, read per call. */
  private def enabled(df: DataFrame): Boolean =
    df.sparkSession.conf.get("spark.graft.spread.enabled", "true") == "true"

  def toCores(df: DataFrame): DataFrame =
    if (df.isStreaming || !enabled(df)) df
    else {
      val cores = df.sparkSession.conf
        .get("spark.graft.spread.parts",
          df.sparkSession.sparkContext.defaultParallelism.toString).toInt
      if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
    }

  /** [[toCores]] for OPERATOR-INTERNAL use, where the caller may hand over
    * any frame: applies the spread only when the analyzed plan is narrow
    * work over a single leaf (projections/filters/aliases over one scan),
    * and passes everything else through untouched. That keeps the `.rdd`
    * partition probe away from exchange-rooted plans — probing those
    * would make AQE materialize their shuffle stages eagerly, running
    * jobs at plan-construction time and (because the operator builds a
    * NEW Dataset) re-running them at action time. An exchange-rooted
    * input has already had its parallelism decided by a shuffle, so the
    * narrow-scan pathology this guard exists for cannot apply there
    * anyway.
    */
  def toCoresIfNarrowScan(df: DataFrame): DataFrame =
    if (!df.isStreaming && narrowOverLeaf(df.queryExecution.analyzed))
      toCores(df)
    else df

  private def narrowOverLeaf(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    plan match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => true
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        narrowOverLeaf(p.child)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        narrowOverLeaf(f.child)
      case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        narrowOverLeaf(a.child)
      case _ => false
    }
}
