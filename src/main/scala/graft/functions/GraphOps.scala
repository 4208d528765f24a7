package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph centrality over edge DataFrames.
  *
  * A training-data pipeline meets graphs twice: the near-dup similarity
  * graph (whose central nodes are the natural canonical representatives of
  * a duplicate cluster — the complement of [[MinHashLSH]]'s min-label
  * pick), and the hyperlink graph of a web crawl (where PageRank is the
  * classic quality prior — Page et al. 1999, and Common-Crawl-derived
  * corpora routinely carry a centrality-based quality signal).
  *
  * Everything here is DataFrame-first — one equijoin + one keyed
  * aggregation per iteration, exactly the shuffle a 1000-executor cluster
  * can do at 100 TB — and *integer-exact*: ranks live on a
  * parts-per-billion long grid and every step is BIGINT `div`, so the
  * result is a pure function of the edge set, independent of partitioning,
  * summation order, or float association — replayable bit-for-bit by any
  * engine with 64-bit integer division (the
  * [[TextAnalysis.unigramLogProb]] determinism discipline, applied to an
  * iterative fixpoint instead of a single aggregate).
  */
object GraphOps {

  /** PageRank on the parts-per-billion integer grid, fixed iteration count.
    *
    * Recurrence (all BIGINT, N = |nodes|, deg = out-degree):
    * {{{
    *   r0(v)     = 10^9 div N
    *   r_t+1(v)  = (15*10^7) div N  +  (85 * Σ_{u→v} (r_t(u)·w_uv div W_u)) div 100
    * }}}
    * where `w_uv` is the edge weight (1 when `weightCol` is absent — then
    * `W_u = deg(u)` and the split is uniform; weights must be POSITIVE
    * longs, e.g. micro-scaled similarities) —
    * i.e. damping 0.85 with truncating integer division at every step —
    * deterministic across engines and partitionings because long `div` and
    * long `sum` are exact and order-free, unlike a double recurrence whose
    * reduction order differs per shuffle. Dangling mass (deg-0 nodes) is
    * dropped, the common simplification; on a symmetrized similarity graph
    * every node has out-edges so none exists there.
    *
    * Plan shape, per iteration: ONE equijoin of the rank vector against
    * the degree-fused edge table (hash-partitioned on src) + ONE keyed sum
    * (shuffle on dst) + a left join back onto the node set for in-degree-0
    * nodes. The degree-fused edge table and the node set are computed once
    * and persisted (the S4 reuse rule — every iteration reads both); the
    * scalar N rides along as a broadcast 1-row crossJoin, never a driver
    * collect. Lineage is truncated with `localCheckpoint` every
    * `checkpointEvery` iterations — at deep iteration counts the
    * accumulated join-over-join plan otherwise grows without bound (the
    * same cliff [[MinHashLSH.clustersStar]] hit in round 10).
    *
    * Returns one row per node: (id, rank_ppb) — rank scaled by 10^9,
    * summing to ≤ 10^9 (truncation loses ≤ 1 ppb per edge per round).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, checkpointEvery: Int = 8,
               weightCol: Option[String] = None): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters=$iters out of [1,100]")
    require(checkpointEvery >= 1, s"checkpointEvery=$checkpointEvery")
    val disk = StorageLevel.MEMORY_AND_DISK
    // Weighted form: an out-edge receives mass ∝ its positive integer
    // weight, `(r·w) div Σw` — with w ≡ 1 this is IDENTICAL (bit-for-bit)
    // to the uniform `r div deg` split, so one loop serves both. Weights
    // must fit the product bound r·w < 2^63: r ≤ 10^9, so w ≤ ~9·10^9 —
    // micro-scaled similarities (≤ 10^6) are far inside it.
    val e = weightCol match {
      case Some(w) => edges.select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"), col(w).cast("long").as("__w"))
      case None => edges.select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"), lit(1L).as("__w"))
    }
    // Out-weight fused onto each edge ONCE — re-deriving it per iteration
    // would re-shuffle the full edge table every round.
    val tw = e.groupBy("__src").agg(sum("__w").as("__tw"))
    val ed = graft.CacheRegistry.track(e.join(tw, "__src").persist(disk))
    val nodes = graft.CacheRegistry.track(
      e.select(col("__src").as("__id"))
        .union(e.select(col("__dst").as("__id")))
        .distinct().persist(disk))
    val nRow = broadcast(nodes.agg(count(lit(1)).cast("long").as("__n")))
    var r = nodes.crossJoin(nRow)
      .selectExpr("__id", "CAST(1000000000 AS BIGINT) div __n AS __r")
    for (t <- 1 to iters) {
      val sums = ed.join(r, col("__src") === col("__id"))
        .selectExpr("__dst", "(__r * __w) div __tw AS __c")
        .groupBy("__dst").agg(sum("__c").as("__s"))
      r = nodes.join(sums, nodes("__id") === sums("__dst"), "left")
        .crossJoin(nRow)
        .selectExpr("__id",
          ("CAST(150000000 AS BIGINT) div __n" +
            " + (85 * coalesce(__s, CAST(0 AS BIGINT))) div 100 AS __r"))
      if (t % checkpointEvery == 0 && t < iters) r = r.localCheckpoint()
    }
    r.selectExpr("__id AS id", "__r AS rank_ppb")
  }

  /** Synchronous label propagation (Raghavan et al. 2007), fixed rounds —
    * community detection over a similarity graph: where connected
    * components ([[MinHashLSH.clusters]]) answer "transitively linked at
    * all?", LPA's majority vote splits a component into its densely-linked
    * cores, the granularity diversity-aware sampling wants (cap per
    * community, not per giant component).
    *
    * Determinism: labels start as own ids; each round every node takes the
    * label most frequent among its IN-neighbors, ties broken by smallest
    * label, nodes with no in-edges keep their label — a pure integer
    * argmax, so fixed-round output is a pure function of the edge set
    * (asynchronous/randomized LPA is not, which is why rounds are fixed
    * and synchronous). Per round: ONE equijoin + a (node, label) count agg
    * + a per-node argmax window — all keyed on node id, no cross product;
    * `localCheckpoint` cadence as in [[pageRank]]. Pass a symmetrized
    * edge list for undirected semantics.
    *
    * Returns (id, community) for every node in the edge set.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int = 3, checkpointEvery: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters=$iters out of [1,100]")
    require(checkpointEvery >= 1, s"checkpointEvery=$checkpointEvery")
    val disk = StorageLevel.MEMORY_AND_DISK
    val e = graft.CacheRegistry.track(
      edges.select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst")).persist(disk))
    val nodes = graft.CacheRegistry.track(
      e.select(col("__src").as("__id"))
        .union(e.select(col("__dst").as("__id")))
        .distinct().persist(disk))
    var lab = nodes.select(col("__id"), col("__id").as("__lab"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__dst").orderBy(col("__v").desc, col("__lab").asc)
    for (t <- 1 to iters) {
      val win = e.join(lab, col("__src") === col("__id"))
        .groupBy(col("__dst"), col("__lab"))
        .agg(count(lit(1)).as("__v"))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("__dst"), col("__lab").as("__newlab"))
      lab = lab.join(win, lab("__id") === win("__dst"), "left")
        .select(col("__id"),
          coalesce(col("__newlab"), col("__lab")).as("__lab"))
      if (t % checkpointEvery == 0 && t < iters) lab = lab.localCheckpoint()
    }
    lab.selectExpr("__id AS id", "__lab AS community")
  }

  /** Triangle census of an undirected graph — the structure audit of a
    * similarity graph: a near-dup graph whose edges are real duplicates is
    * triangle-dense (duplicates of a duplicate are duplicates), while
    * band-collision noise shows up as open wedges, so the global
    * clustering coefficient is a one-row quality gate on the LSH pair set
    * itself (the d103 recall gate's structural complement).
    *
    * Counting uses the ordered-orientation identity: normalize every edge
    * to `a < b`, then each triangle `u < v < w` is exactly ONE match of
    * `(u,v) ⋈ (v,w) ⋈ (u,w)` — two equijoins over the oriented edge table,
    * no permutation double-count, no DISTINCT. The oriented table is
    * persisted once and read three times (S4). Wedges are a pure degree
    * aggregate: `Σ d(d−1)/2` over the symmetrized degree — all BIGINT, and
    * the coefficient is emitted on the 1e-6 integer grid
    * (`3·T·10^6 div wedges`), engine-replayable like [[pageRank]].
    *
    * Skew note: a hub of degree D contributes O(D²) join candidates; the
    * `a < b` orientation halves it, and at 100 TB the standard refinement
    * — orient by (degree, id) instead of raw id so every vertex keeps
    * out-degree O(√|E|) — is a drop-in change of the `least/greatest` pair
    * here, at the cost of a degree pre-join. AQE skew-join covers the
    * moderate cases (SCALE.md).
    *
    * Returns ONE row: (n_nodes, n_edges, n_triangles, n_wedges, gcc_micro).
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val disk = StorageLevel.MEMORY_AND_DISK
    val e = graft.CacheRegistry.track(
      edges.select(
          least(col(srcCol), col(dstCol)).cast("long").as("a"),
          greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
        .where(col("a") =!= col("b"))
        .distinct().persist(disk))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .agg(count(lit(1)).cast("long").as("n_triangles"))
    val dg = e.select(col("a").as("id"))
      .union(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).cast("long").as("d"))
    val wedge = dg.agg(count(lit(1)).cast("long").as("n_nodes"),
      // coalesce: sum over ZERO nodes (empty edge input) is null, and the
      // census must stay total on empty frames (EmptyInputSpec)
      coalesce(sum(expr("d * (d - 1) div 2")), lit(0L))
        .cast("long").as("n_wedges"))
    val ne = e.agg(count(lit(1)).cast("long").as("n_edges"))
    wedge.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
      .selectExpr("n_nodes", "n_edges", "n_triangles", "n_wedges",
        ("CASE WHEN n_wedges > 0 THEN (3 * n_triangles * CAST(1000000 AS" +
          " BIGINT)) div n_wedges ELSE CAST(0 AS BIGINT) END AS gcc_micro"))
  }
}
