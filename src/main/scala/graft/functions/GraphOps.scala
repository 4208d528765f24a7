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
    *
    * `seeds` (personalized PageRank, Haveliwala 2002): when given (first
    * column = node id), BOTH the initial mass and the per-iteration
    * teleport land only on seed nodes — `10^9 div |S∩nodes|` and
    * `(15·10^7) div |S∩nodes|` respectively, 0 elsewhere — so rank
    * measures proximity to the seed set through the graph, the "expand a
    * trusted subset" primitive (seed = curated docs, rank = crawl-quality
    * prior). With `seeds = None` the uniform recurrence above is computed
    * bit-for-bit unchanged. The seed set must intersect the node set —
    * an empty intersection makes the teleport division fail loudly
    * rather than silently returning the zero vector.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, checkpointEvery: Int = 8,
               weightCol: Option[String] = None,
               seeds: Option[DataFrame] = None): DataFrame = {
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
    // (__id, __init, __tele) — initial mass and per-iteration teleport,
    // fused once (uniform or seed-restricted) and persisted: every
    // iteration's rebuild joins against it.
    val nodesRaw = e.select(col("__src").as("__id"))
      .union(e.select(col("__dst").as("__id")))
      .distinct()
    val nt = seeds match {
      case None =>
        val nRow = broadcast(nodesRaw.agg(count(lit(1)).cast("long").as("__n")))
        nodesRaw.crossJoin(nRow).selectExpr("__id",
          "CAST(1000000000 AS BIGINT) div __n AS __init",
          "CAST(150000000 AS BIGINT) div __n AS __tele")
      case Some(sd) =>
        // seed list is a broadcast-sized id set; flag + count ∩ nodes in
        // one left join (never a collect)
        val s = sd.select(col(sd.columns.head).cast("long").as("__id"))
          .distinct().withColumn("__sd", lit(1))
        val flagged = nodesRaw.join(broadcast(s), Seq("__id"), "left")
        val nsRow = broadcast(flagged.agg(
          sum(when(col("__sd").isNotNull, 1L).otherwise(0L))
            .cast("long").as("__ns")))
        flagged.crossJoin(nsRow).selectExpr("__id",
          ("CASE WHEN __sd IS NOT NULL THEN CAST(1000000000 AS BIGINT)" +
            " div __ns ELSE CAST(0 AS BIGINT) END AS __init"),
          ("CASE WHEN __sd IS NOT NULL THEN CAST(150000000 AS BIGINT)" +
            " div __ns ELSE CAST(0 AS BIGINT) END AS __tele"))
    }
    val nodes = graft.CacheRegistry.track(nt.persist(disk))
    var r = nodes.select(col("__id"), col("__init").as("__r"))
    for (t <- 1 to iters) {
      val sums = ed.join(r, col("__src") === col("__id"))
        .selectExpr("__dst", "(__r * __w) div __tw AS __c")
        .groupBy("__dst").agg(sum("__c").as("__s"))
      r = nodes.join(sums, nodes("__id") === sums("__dst"), "left")
        .selectExpr("__id",
          "__tele + (85 * coalesce(__s, CAST(0 AS BIGINT))) div 100 AS __r")
      if (t % checkpointEvery == 0 && t < iters) r = r.localCheckpoint()
    }
    r.selectExpr("__id AS id", "__r AS rank_ppb")
  }

  /** Fixed-round k-core peel (Seidman 1983) of an undirected graph — the
    * density audit of a near-dup neighborhood: the k-core is the maximal
    * subgraph where every node keeps ≥ k neighbors, so core membership
    * separates genuinely duplicate-dense regions (which survive peeling)
    * from band-collision fringe (degree-1/2 tendrils peel off in the
    * first rounds) — a sharper structural gate than [[triangleStats]]'
    * one-row census, per node instead of global.
    *
    * One peel round: restrict edges to pairs whose BOTH endpoints
    * survived the previous round (two semi joins on the persisted edge
    * table), recount degrees (one keyed agg), keep nodes with degree ≥ k.
    * Rounds are FIXED like [[labelPropagation]] — the output after R
    * rounds is the R-round peel (a superset of the true k-core that
    * equals it once peeling stabilizes, which the spec checks on its
    * fixtures by comparing R and R+1) and a pure integer function of the
    * edge set, replayable by any engine as R unrolled restrict-count
    * rounds. Per round the surviving edge set only shrinks, so the
    * shuffle budget is monotonically decreasing; the round's node-sized
    * degree table is materialized eagerly (`localCheckpoint`) because
    * BOTH next-round semi joins and the loop exit read it — lazy, the
    * recompute tree doubles per round (`checkpointEvery` is retained for
    * signature stability; per-round materialization supersedes it). Pass
    * a symmetrized edge list.
    *
    * Returns (id, degree) for nodes surviving round R — degree counted
    * in the round-R restricted graph.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int = 3, checkpointEvery: Int = 8): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1 && rounds <= 100, s"rounds=$rounds out of [1,100]")
    require(checkpointEvery >= 1, s"checkpointEvery=$checkpointEvery")
    val disk = StorageLevel.MEMORY_AND_DISK
    val e = graft.CacheRegistry.track(
      edges.select(col(srcCol).cast("long").as("__src"),
          col(dstCol).cast("long").as("__dst"))
        .where(col("__src") =!= col("__dst"))
        .distinct().persist(disk))
    var surv = e.select(col("__src").as("__id")).distinct()
    var deg: DataFrame = null
    for (t <- 1 to rounds) {
      val rs = e.join(surv, e("__src") === surv("__id"), "left_semi")
      val rd = rs.join(surv, rs("__dst") === surv("__id"), "left_semi")
      // deg is MATERIALIZED each round (eager localCheckpoint): the next
      // round reads surv TWICE (both endpoint semi joins) and the loop
      // exit reads deg again — left lazy, the recompute tree would double
      // per round (2^rounds plans), the Pregel-superstep lesson. Node-
      // sized, so the materialization is the cheapest step of the round.
      deg = rd.groupBy("__src").agg(count(lit(1)).cast("long").as("__d"))
        .localCheckpoint()
      surv = deg.where(col("__d") >= k).select(col("__src").as("__id"))
    }
    deg.where(col("__d") >= k).selectExpr("__src AS id", "__d AS degree")
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
    * + a per-node argmax window — all keyed on node id, no cross product.
    * Each round's node-sized label table is materialized eagerly
    * (`localCheckpoint`): the next round reads it twice (vote join +
    * carry-forward), so a lazy lineage doubles the recompute tree per
    * round — the Pregel superstep shape (`checkpointEvery` retained for
    * signature stability; per-round materialization supersedes it). Pass
    * a symmetrized edge list for undirected semantics.
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
      // lab is MATERIALIZED each round (eager localCheckpoint): the next
      // round reads it TWICE — the vote join and the carry-forward left
      // join — so a lazy lineage doubles the recompute tree per round
      // (2^iters plans; the cadence checkpoint alone cannot prevent it).
      // One node-sized materialization per superstep is the Pregel shape.
      lab = lab.join(win, lab("__id") === win("__dst"), "left")
        .select(col("__id"),
          coalesce(col("__newlab"), col("__lab")).as("__lab"))
        .localCheckpoint()
    }
    lab.selectExpr("__id AS id", "__lab AS community")
  }

  /** Newman modularity of a community assignment on the 1e-6 integer
    * grid — the closure of the [[labelPropagation]] loop: LPA proposes
    * communities, modularity SCORES them (`Q = Σ_c [L_c/m − (D_c/2m)²]`,
    * Newman & Girvan 2004 — intra-community edge mass vs the degree-
    * preserving random expectation), so a pipeline can gate "cap
    * sampling per community" on the partition actually being denser than
    * chance (Q > 0) instead of trusting the fixed-round vote blindly.
    *
    * Integer discipline: per community the positive term
    * `(L_c·10^6) div m` and the expectation term
    * `(D_c²·10^6) div (4m²)` are each computed in decimal(38,0) (D_c² at
    * web scale exceeds long range) and truncated to a long SEPARATELY —
    * both non-negative, so truncating `div` and the oracle's floor `//`
    * agree — then summed exactly: `q_micro = Σadd − Σsub`. No float
    * enters, so the score is a pure function of (edges, assignment).
    *
    * Plan: orient + dedup edges once (persisted, read twice — the
    * [[triangleStats]] S4 shape); TWO broadcast-or-keyed joins hang the
    * community id on each endpoint; intra-edge count and community
    * degree are keyed aggs; the scalar m rides a broadcast 1-row
    * crossJoin. Nodes missing from `assign` keep their own id as a
    * singleton community (coalesce), so the score is total.
    *
    * Returns ONE row: (n_nodes, n_edges, n_communities, intra_edges,
    * q_micro).
    */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 assign: DataFrame, idCol: String,
                 commCol: String): DataFrame = {
    val disk = StorageLevel.MEMORY_AND_DISK
    val e = graft.CacheRegistry.track(
      edges.select(
          least(col(srcCol), col(dstCol)).cast("long").as("a"),
          greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
        .where(col("a") =!= col("b"))
        .distinct().persist(disk))
    // persisted: BOTH endpoint joins read the assignment, and the caller
    // may hand over an expensive unmaterialized proposal (d139 feeds the
    // 3-round LPA output here — unpersisted, every vote round would
    // recompute once per endpoint side)
    val cm = graft.CacheRegistry.track(
      assign.select(col(idCol).cast("long").as("__id"),
          col(commCol).cast("long").as("__cm"))
        .persist(disk))
    val mRow = broadcast(e.agg(count(lit(1)).cast("long").as("m")))
    // community on each endpoint; unassigned nodes become singletons
    val cma = cm.select(col("__id").as("__ida"), col("__cm").as("__ca"))
    val cmb = cm.select(col("__id").as("__idb"), col("__cm").as("__cb"))
    val withC = e
      .join(cma, e("a") === col("__ida"), "left")
      .join(cmb, e("b") === col("__idb"), "left")
      .select(col("a"), col("b"),
        coalesce(col("__ca"), col("a")).as("ca"),
        coalesce(col("__cb"), col("b")).as("cb"))
    val intra = withC.where(col("ca") === col("cb"))
      .groupBy(col("ca").as("c")).agg(count(lit(1)).cast("long").as("lc"))
    val deg = withC.select(col("ca").as("c"))
      .union(withC.select(col("cb").as("c")))
      .groupBy("c").agg(count(lit(1)).cast("long").as("dc"))
    val terms = deg.join(intra, Seq("c"), "left")
      .select(col("c"), coalesce(col("lc"), lit(0L)).as("lc"), col("dc"))
      .crossJoin(mRow)
      .selectExpr("c", "lc",
        "lc * CAST(1000000 AS BIGINT) div m AS add_micro",
        ("CAST(dc AS DECIMAL(38,0)) * dc * 1000000" +
          " div (CAST(4 AS DECIMAL(38,0)) * m * m) AS sub_micro"))
    val nn = broadcast(e.select(col("a").as("id"))
      .union(e.select(col("b").as("id"))).distinct()
      .agg(count(lit(1)).cast("long").as("n_nodes")))
    terms.agg(
        count(lit(1)).cast("long").as("n_communities"),
        coalesce(sum("lc"), lit(0L)).cast("long").as("intra_edges"),
        (coalesce(sum("add_micro"), lit(0L)) -
          coalesce(sum("sub_micro"), lit(0L))).cast("long").as("q_micro"))
      .crossJoin(nn).crossJoin(mRow)
      .selectExpr("n_nodes", "m AS n_edges", "n_communities",
        "intra_edges", "q_micro")
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

  /** Degree assortativity of an undirected graph on the 1e-6 integer
    * grid (Newman 2002): the Pearson correlation of endpoint degrees
    * across edges — positive means dup hubs link to other hubs (template
    * farms, mirror rings: one component worth capping as a unit),
    * negative means hub-and-spoke (one canonical page quoted everywhere:
    * per-node election is the right dedup). The structural complement of
    * [[triangleStats]]' closure census and [[kCore]]'s per-node density.
    *
    * PURE integer arithmetic end to end — degrees are counts, every sum
    * runs in decimal(38,0) (Σdeg² at web scale exceeds long), and the
    * correlation lands by signed grid division `sign·(|num·10^6| div den)`
    * (num < 0 on disassortative graphs — the d133 truncate-vs-floor
    * lesson). Unlike the entropy meters there is NO shared-libm
    * dependency at all: any engine replays the row from the edge set
    * bit-for-bit. On the symmetrized list the two endpoint-degree
    * marginals coincide, so `r = (m·Σxy − (Σx)²) div (m·Σx² − (Σx)²)`;
    * a degree-regular graph (den = 0, r undefined) reports 0.
    *
    * Plan: one degree agg (keyed), two equijoins hanging the degree on
    * each endpoint, one 1-row total agg — no iteration, no float, and
    * the only corpus-sized exchanges key on node id. Pass a symmetrized
    * edge list ([[kCore]]'s contract).
    *
    * Returns ONE row: (n_nodes, n_edges, max_degree, r_micro) —
    * n_edges counts directed (symmetrized) edges.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val disk = StorageLevel.MEMORY_AND_DISK
    val e = graft.CacheRegistry.track(
      edges.select(col(srcCol).cast("long").as("__src"),
          col(dstCol).cast("long").as("__dst"))
        .where(col("__src") =!= col("__dst"))
        .distinct().persist(disk))
    val deg = e.groupBy(col("__src").as("__id"))
      .agg(count(lit(1)).cast("long").as("__d"))
    val da = deg.select(col("__id").as("__ida"), col("__d").as("__du"))
    val db = deg.select(col("__id").as("__idb"), col("__d").as("__dv"))
    val s = e.join(da, e("__src") === col("__ida"))
      .join(db, e("__dst") === col("__idb"))
      .selectExpr("CAST(__du AS DECIMAL(38,0)) AS du",
        "CAST(__dv AS DECIMAL(38,0)) AS dv")
      .agg(count(lit(1)).cast("long").as("m"),
        coalesce(sum(col("du")), lit(0L).cast("decimal(38,0)")).as("sx"),
        coalesce(sum(col("du") * col("dv")),
          lit(0L).cast("decimal(38,0)")).as("sxy"),
        coalesce(sum(col("du") * col("du")),
          lit(0L).cast("decimal(38,0)")).as("sxx"),
        coalesce(max(col("du")), lit(0L).cast("decimal(38,0)"))
          .cast("long").as("max_degree"))
    val nn = broadcast(e.select(col("__src")).distinct()
      .agg(count(lit(1)).cast("long").as("n_nodes")))
    s.crossJoin(nn).selectExpr("n_nodes", "m AS n_edges", "max_degree",
      ("CASE WHEN m * sxx - sx * sx <= 0 THEN CAST(0 AS BIGINT)" +
        " WHEN m * sxy - sx * sx >= 0" +
        " THEN CAST((m * sxy - sx * sx) * 1000000" +
        " div (m * sxx - sx * sx) AS BIGINT)" +
        " ELSE -CAST((-(m * sxy - sx * sx)) * 1000000" +
        " div (m * sxx - sx * sx) AS BIGINT) END AS r_micro"))
  }
}
