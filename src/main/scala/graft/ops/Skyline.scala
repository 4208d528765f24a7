package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, maximize both dimensions) — the
  * multi-criteria selection operator OLAP engines bolt on for "best
  * trade-off" queries (skyline integration into Spark SQL is EDBT 2023
  * material; the operator itself is Börzsönyi et al., ICDE 2001). In a
  * training-data pipeline it answers "which documents are not strictly
  * worse than some other document in BOTH quality and length" — the
  * non-dominated candidate set a curator inspects before fixing
  * thresholds, computed without picking weights first.
  *
  * Dominance: row r is dominated iff some r' has x' >= x AND y' >= y with
  * at least one strict. Equal (x, y) duplicates do not dominate each
  * other — all copies of a non-dominated point are returned.
  *
  * Scale shape — NO global sort of the data and NO pairwise join: the
  * d65 percentileCalibrate census pattern. One partial-agg shuffle builds
  * the per-x census `(x, ymax)` (bounded by |distinct x| — grid-rounded
  * scores make this a few 10^4 rows no matter the corpus size); the
  * running prefix-max over higher x runs on THAT census (window over
  * census rows, never corpus rows); the surviving `(x, ymax)` skyline
  * coordinates broadcast back onto the scan as a semi-join predicate.
  * A row is on the skyline iff
  *   (a) y equals its x-group's max (ties all kept), and
  *   (b) that max strictly exceeds every higher-x group's max.
  *
  * Deterministic and engine-replayable: the skyline is a pure function of
  * the point set (no hashing, no ordering sensitivity), so an external
  * SQL engine replays it from the same two closed-form rules.
  */
object Skyline {

  /** Rows of `df` on the maximize-(xCol, yCol) skyline, original columns
    * preserved. Null x or y rows are excluded (no order against null).
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val census = pts.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__ymax"))
    // prefix max of __ymax over STRICTLY greater x: census-sized window
    val w = Window.orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = census
      .withColumn("__pre", max(col("__ymax")).over(w))
      .where(col("__pre").isNull || col("__ymax") > col("__pre"))
      .select(col("__x"), col("__ymax"))
    pts.join(broadcast(sky),
        pts(xCol) === col("__x") && pts(yCol) === col("__ymax"), "left_semi")
  }

  /** Per-domain skyline — one Pareto frontier per `domCol` group (the
    * "best trade-off candidates per language/source" form). Same census
    * plan as [[skyline2D]] with every stage keyed by domain, which makes
    * it strictly MORE scalable: the prefix-max window partitions by
    * domain (parallel across domains, no single-partition stage at all)
    * and the census is |domains|·|distinct x| rows.
    */
  def skylineByDomain(df: DataFrame, domCol: String, xCol: String,
                      yCol: String): DataFrame = {
    val pts = df.where(col(domCol).isNotNull &&
      col(xCol).isNotNull && col(yCol).isNotNull)
    val census = pts.groupBy(col(domCol).as("__d"), col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__ymax"))
    val w = Window.partitionBy(col("__d")).orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = census
      .withColumn("__pre", max(col("__ymax")).over(w))
      .where(col("__pre").isNull || col("__ymax") > col("__pre"))
      .select(col("__d"), col("__x"), col("__ymax"))
    pts.join(broadcast(sky),
      pts(domCol) === col("__d") && pts(xCol) === col("__x") &&
        pts(yCol) === col("__ymax"), "left_semi")
  }

  /** Sequential skyline over an in-memory point set — the per-group merge
    * step the streaming frontier ([[graft.streaming.SkylineStream]]) runs
    * inside its state update; x-desc sweep with a running y max, per-x
    * ties all kept. O(n log n), n = frontier + batch group. Generic in
    * the id type; both dimensions compare as Double (the streaming twin
    * carries the input's native y through a double — exact below 2^53).
    */
  private[graft] def localSkyline[I](
      pts: Seq[(I, Double, Double)]): Seq[(I, Double, Double)] = {
    // Parity with Spark SQL's total order on BOTH dimensions: NaN is the
    // greatest value and equals itself; -0.0 == 0.0. Primitive ==/> get
    // both wrong for NaN (NaN == NaN is false, NaN > best is false) — a
    // single NaN y would first make its x group emit nothing and then, as
    // `best`, reject every later group, wiping the frontier. Canonicalize
    // -0.0 for key/tie classes and compare through Double.compare (all
    // NaN payloads one class); output tuples keep their ORIGINAL values.
    def canon(v: Double) = if (v == 0.0) 0.0 else v
    val to = Ordering.Double.TotalOrdering
    val byX = pts.groupBy(p => canon(p._2)).toSeq
      .sortBy(_._1)(to.reverse) // x descending; NaN-x group first
    // `first` rather than a -Infinity sentinel: a highest-x group whose
    // ymax IS -Infinity must still survive (batch rule: prefix max NULL)
    var best = Double.NegativeInfinity
    var first = true
    val out = scala.collection.mutable.Buffer.empty[(I, Double, Double)]
    for ((_, g) <- byX) {
      val ymax = g.map(p => canon(p._3)).max(to)
      if (first || java.lang.Double.compare(ymax, best) > 0) {
        out ++= g.filter(p => java.lang.Double.compare(canon(p._3), ymax) == 0)
        best = ymax; first = false
      }
    }
    out.toSeq
  }
}
