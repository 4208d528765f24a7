package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting for
  * corpus curation: assignments depend only on the row's id (via md5), so
  * they are stable across runs, partitionings, engines, and cluster sizes
  * — the property a reproducible train/val/test split needs and
  * `rand()`-based sampling lacks. Pure column expressions: no shuffle, no
  * state, stream-safe, and replayable by any SQL oracle.
  */
object Sampling {

  /** 32-bit md5-derived bucket value in [0, 2^32) for an id column — the
    * shared randomness source for splits and samples.
    */
  def hashValue(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Stable split assignment: weights like Seq("train" -> 8, "val" -> 1,
    * "test" -> 1) partition the hash space proportionally; every id lands
    * in exactly one split, forever.
    */
  def hashSplit(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive, got $weights")
    val total = weights.map(_._2).sum
    val bucket = pmod(hashValue(id), lit(total))
    val (expr0, _) = weights.foldLeft((lit(null).cast("string"), 0L)) {
      case ((acc, cum), (name, w)) =>
        (when(bucket >= cum && bucket < cum + w, lit(name)).otherwise(acc),
          cum + w)
    }
    expr0
  }

  /** Deterministic Bernoulli(rate) keep-predicate: true for the stable
    * `rate` fraction of ids. Unlike `df.sample`, re-running, repartitioning
    * or growing the table never changes which surviving rows survive.
    */
  def hashSample(id: Column, rate: Double): Column = {
    require(rate >= 0.0 && rate <= 1.0, s"rate=$rate out of [0,1]")
    // 2^32 * rate as an exact long bound — portable integer compare
    hashValue(id) < math.round(4294967296.0 * rate)
  }
}
