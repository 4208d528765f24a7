package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Rank-list fusion for multi-signal retrieval.
  *
  * A curation pipeline rarely trusts ONE relevance signal: eval-set mining
  * and targeted corpus search run a lexical ranker ([[TextAnalysis.bm25TopK]])
  * and a semantic ranker ([[VectorOps.knnBruteForce]] / [[VectorIVF]]) side
  * by side and fuse them. Reciprocal-rank fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009) is the standard score-free combiner: it needs only
  * the RANKS, so heterogeneous scores (BM25 floats vs cosine) never have to
  * be calibrated against each other.
  */
object Retrieval {

  /** Reciprocal-rank fusion of N ranked lists on the integer micro grid.
    *
    * `score(id) = Σ_lists 10^6 div (rrfK + rank_list(id))`, missing-from-a-
    * list contributing 0 — all BIGINT, so the fused ordering is a pure
    * function of the input ranks, replayable exactly by any engine (the
    * [[GraphOps.pageRank]] discipline). rrfK=60 is the paper's constant.
    *
    * Plan shape: the inputs are ALREADY top-k-reduced lists (each ≤ a few
    * dozen rows at any corpus size — their producers did the distributed
    * work), so the full-outer alignment join and the final rank window run
    * on k-sized data; nothing here is corpus-sized. The global top-k is
    * `orderBy.limit` (TakeOrderedAndProject) before the ≤topK-row window,
    * the [[TextAnalysis.bm25TopK]] pattern.
    *
    * Returns (idCol, rk_<label>... one per list (null = absent), rrf_micro,
    * rk), rk 1..topK by (rrf_micro desc, id asc).
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String,
              rankCol: String, rrfK: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(lists.map(_._1).distinct.size == lists.size, "duplicate labels")
    require(rrfK >= 0 && topK > 0, s"rrfK=$rrfK topK=$topK out of range")
    val parts = lists.map { case (label, df) =>
      df.select(col(idCol).cast("long").as("__id"),
        col(rankCol).cast("long").as(s"rk_$label"))
    }
    val joined = parts.reduce(_.join(_, Seq("__id"), "full_outer"))
    val score = lists.map { case (label, _) =>
      coalesce(expr(s"CAST(1000000 AS BIGINT) div ($rrfK + rk_$label)"),
        lit(0L))
    }.reduce(_ + _)
    val top = joined.withColumn("rrf_micro", score)
      .orderBy(col("rrf_micro").desc, col("__id").asc)
      .limit(topK)
    val outCols = (col("__id").as(idCol) +:
      lists.map { case (l, _) => col(s"rk_$l") }) :+
      col("rrf_micro") :+ col("rk")
    top // rank the topK survivors only — a window over ≤ topK rows
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rrf_micro").desc, col("__id").asc)).cast("int"))
      .select(outCols: _*)
  }
}
