package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval–point range join via bucketing — the second time-series join
  * Spark lacks a scale plan for: a plain `t BETWEEN lo AND hi` join
  * condition plans a BroadcastNestedLoop/Cartesian whose work is
  * |intervals| × |points| before any filtering.
  *
  * Scale shape: each [lo, hi] interval explodes into the bins it covers
  * (bounded by interval length / binWidth + 1 — a property of the QUERY,
  * not the data), each point maps to exactly one bin, candidates come from
  * the (keys, bin) EQUIJOIN, and exact containment filters the candidate
  * set. One shuffle on (keys, bin); pick `binWidth` near the typical
  * interval length so intervals span O(1) bins.
  *
  * Works over any ordered integral axis (epoch-ns longs, instance ids).
  * Non-negative axis values assumed (`div` truncation = floor there).
  */
object RangeJoin {

  def intervalPoint(intervals: DataFrame, points: DataFrame, keys: Seq[String],
                    loCol: String, hiCol: String, tCol: String,
                    binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // integer `div`, not double division — ns-scale longs exceed 2^53
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"`$loCol` div $binWidth"), expr(s"`$hiCol` div $binWidth"))))
    val pt = points.withColumn("__bin", expr(s"`$tCol` div $binWidth"))
    iv.join(pt, keys :+ "__bin")
      .where(col(tCol).between(col(loCol), col(hiCol)))
      .drop("__bin")
  }
}
