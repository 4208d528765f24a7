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

  /** Kendall rank agreement between two top-k lists — the retrieval-eval
    * census that tells a pipeline whether its lexical and semantic rankers
    * actually DISAGREE (fusion only helps when they do): over the ids both
    * lists rank, count concordant vs discordant pairs; tau = (C−D)/(C+D)
    * on the 1e-6 integer grid. Ranks within a list are distinct by
    * construction, so the tie terms of tau-b vanish and tau-a == tau-b.
    *
    * Both inputs are already top-k-reduced, so the intersection join and
    * the k²-pair census are constant-sized at any corpus scale (the
    * [[rrfFuse]] argument); the pair join is the one deliberate
    * inequality join in this file, over ≤ k rows. The signed division is
    * computed as `sign · (|C−D|·10^6 div (C+D))` — dividing only
    * non-negative values, because floor (DuckDB `//`) and truncate
    * (Spark `div`) disagree on negative dividends.
    *
    * Returns ONE row: (n_common, concordant, discordant, tau_micro).
    */
  def rankAgreement(a: DataFrame, b: DataFrame, idCol: String,
                    rankCol: String): DataFrame = {
    val ja = a.select(col(idCol).cast("long").as("__id"),
      col(rankCol).cast("long").as("__ra"))
    val jb = b.select(col(idCol).cast("long").as("__id"),
      col(rankCol).cast("long").as("__rb"))
    val j = ja.join(jb, Seq("__id"))
    val pairs = j.select(col("__id").as("__i"), col("__ra").as("__rax"),
        col("__rb").as("__rbx"))
      .join(j, col("__i") < col("__id"))
      .select(
        ((col("__rax") - col("__ra")) * (col("__rbx") - col("__rb")))
          .as("__prod"))
    val census = pairs.agg(
      coalesce(sum(when(col("__prod") > 0, 1L).otherwise(0L)), lit(0L))
        .as("concordant"),
      coalesce(sum(when(col("__prod") < 0, 1L).otherwise(0L)), lit(0L))
        .as("discordant"))
    val nRow = broadcast(j.agg(count(lit(1)).cast("long").as("n_common")))
    census.crossJoin(nRow)
      .selectExpr("n_common", "concordant", "discordant",
        ("CASE WHEN concordant + discordant = 0 THEN CAST(0 AS BIGINT)" +
          " WHEN concordant >= discordant THEN (concordant - discordant)" +
          " * CAST(1000000 AS BIGINT) div (concordant + discordant)" +
          " ELSE -((discordant - concordant) * CAST(1000000 AS BIGINT)" +
          " div (concordant + discordant)) END AS tau_micro"))
  }
}
