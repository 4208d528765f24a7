package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE per-domain Pareto frontier — the streaming twin of
  * [[graft.ops.Skyline.skylineByDomain]]: as documents arrive, each
  * domain's state holds exactly its current frontier (non-dominated
  * points with their row ids), and every micro-batch that touches a
  * domain re-emits that domain's full frontier (update-mode semantics,
  * the d92/d99 grouped-sketch convention — with a finite source arriving
  * as one batch, each domain's final frontier is emitted exactly once,
  * which is what the d107 oracle gates against the batch operator).
  *
  * State per domain = the frontier INCLUDING (x, y)-tied duplicates
  * (required for batch parity — equal points don't dominate each other):
  * bounded by |distinct x| × the duplicate multiplicity of frontier
  * points, not by stream length for dominated points (a dominated point
  * is dropped the moment a dominating one arrives and can never return).
  * A corpus where many docs share a frontier (x, y) cell accumulates
  * those ids; if ties don't matter downstream, dedupe to one id per
  * (x, y) before this operator and state is strictly |distinct x|. The
  * per-batch merge is the [[graft.ops.Skyline.localSkyline]] x-desc
  * sweep, O(n log n) in frontier + batch-group size.
  */
object SkylineStream {

  /** Internal comparisons run on DOUBLES for both x and y — casting y to
    * an integer type would merge distinct fractional y values into fake
    * ties and break the documented stream == batch parity with
    * [[graft.ops.Skyline.skylineByDomain]] (which compares the native
    * type). Ids travel as strings (lossless for any atomic id type).
    * Output columns are cast back to the INPUT's own types, so a long
    * n_chars comes back long (exact for |y| < 2^53 — the double round
    * trip is the standard parquet/JS-number bound).
    */
  def frontier(stream: DataFrame, domCol: String, idCol: String,
               xCol: String, yCol: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val domType = stream.schema(domCol).dataType
    val idType = stream.schema(idCol).dataType
    val xType = stream.schema(xCol).dataType
    val yType = stream.schema(yCol).dataType
    val typed: Dataset[(String, String, Double, Double)] = stream
      .where(col(domCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(domCol).cast("string"), col(idCol).cast("string"),
        col(xCol).cast("double"), col(yCol).cast("double"))
      .as[(String, String, Double, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (dom: String, rows: Iterator[(String, String, Double, Double)],
         state: GroupState[Seq[(String, Double, Double)]]) =>
          val merged = graft.ops.Skyline.localSkyline(
            state.getOption.getOrElse(Seq.empty) ++
              rows.map(r => (r._2, r._3, r._4)))
          state.update(merged)
          merged.iterator.map(p => (dom, p._1, p._2, p._3))
      }
      .toDF(domCol, idCol, xCol, yCol)
      .withColumn(domCol, col(domCol).cast(domType))
      .withColumn(idCol, col(idCol).cast(idType))
      .withColumn(xCol, col(xCol).cast(xType))
      .withColumn(yCol, col(yCol).cast(yType))
  }
}
