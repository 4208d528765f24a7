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
  * State is BOUNDED by the frontier size — at most |distinct x| points
  * per domain (grid-rounded scores keep that small), NOT by stream
  * length: a dominated point is dropped the moment a dominating one
  * arrives and can never return. The per-batch merge is the
  * [[graft.ops.Skyline.localSkyline]] x-desc sweep, O(n log n) in
  * frontier + batch-group size.
  */
object SkylineStream {

  def frontier(stream: DataFrame, domCol: String, idCol: String,
               xCol: String, yCol: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val typed: Dataset[(String, Long, Double, Long)] = stream
      .where(col(domCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(domCol).cast("string"), col(idCol).cast("long"),
        col(xCol).cast("double"), col(yCol).cast("long"))
      .as[(String, Long, Double, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (dom: String, rows: Iterator[(String, Long, Double, Long)],
         state: GroupState[Seq[(Long, Double, Long)]]) =>
          val merged = graft.ops.Skyline.localSkyline(
            state.getOption.getOrElse(Seq.empty) ++
              rows.map(r => (r._2, r._3, r._4)))
          state.update(merged)
          merged.iterator.map(p => (dom, p._1, p._2, p._3))
      }
      .toDF(domCol, idCol, xCol, yCol)
  }
}
