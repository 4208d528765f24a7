package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding-vector similarity operators.
  *
  * Everything is expressed over `array<double>` columns with built-in
  * higher-order functions (`zip_with`/`aggregate` — codegen'd, no UDFs).
  *
  * Scale notes: brute-force kNN is O(|queries|·|corpus|) — correct baseline
  * when |queries| is small (broadcast the queries, stream the corpus).
  * `nearDupPairs` blocks on a key column so the join is equality-partitioned,
  * never an unblocked cross product. An IVF-style variant would add a
  * coarse-quantizer bucket column and join on it — same plan shape as the
  * label blocking here.
  */
object VectorOps {

  /** Session-free HOF dot product (interpreted). DataFrame-level operators
    * below use the codegen'd native expression `graft.plans.DotProduct`
    * instead — identical results, tight primitive loop.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd dot product (registers the native expression on the session). */
  private def fastDot(spark: org.apache.spark.sql.SparkSession)(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotColumn(spark, a, b)

  /** Adds an L2-normalized copy of `vecCol` as `outCol` — a map-only
    * projection done ONCE per row, so every downstream pairwise cosine is a
    * single dot product instead of dot + two norms recomputed per pair.
    *
    * The norm is staged as its own attribute and referenced twice (the
    * zero guard + the division) so CollapseProject cannot inline it into
    * the transform lambda, where it would re-evaluate per element.
    */
  def withNormalized(df: DataFrame, vecCol: String, outCol: String): DataFrame = {
    val d = fastDot(df.sparkSession) _
    val nrm = col("__nrm")
    val v = col(vecCol).cast("array<double>")
    df.withColumn("__nrm", sqrt(d(v, v)))
      .withColumn(outCol,
        when(nrm === 0.0, v).otherwise(transform(v, x => x / nrm)))
      .drop("__nrm")
  }

  /** Brute-force top-k cosine neighbors for a small query set.
    * `queries`/`corpus`: (idCol, vecCol) with array<float|double> vectors.
    * Returns (query_id, neighbor_id, rank). Self-matches excluded.
    */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = withNormalized(queries, vecCol, "qv")
      .select(col(idCol).as("query_id"), col("qv"))
    val c = withNormalized(corpus, vecCol, "cv")
      .select(col(idCol).as("neighbor_id"), col("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", fastDot(corpus.sparkSession)(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Contrastive pair mining — the training-set construction step for
    * embedding/retrieval models: for each anchor, its `kPos` most-similar
    * SAME-label rows (positives) and its `kNeg` most-similar
    * DIFFERENT-label rows (hard negatives — high cosine but wrong label,
    * exactly the pairs a contrastive loss learns the most from; random
    * negatives are trivially separable). Returns
    * (anchor_id, cand_id, is_pos ∈ {1,0}, rank), ties to the smaller
    * candidate id.
    *
    * Scale shape: one scored pass — anchors broadcast (small anchor set,
    * the [[knnBruteForce]] contract), candidates stay put, one window
    * partitioned by (anchor, side). For corpus-scale anchor sets, restrict
    * candidates through the IVF cell path first ([[VectorIVF]]) and feed
    * the cell-joined pairs here — the window shape is unchanged.
    *
    * NULL-label convention: rows with a null label are DROPPED from both
    * sides, explicitly. An unlabeled row is neither a positive (same
    * label) nor a hard negative (provably different label), and the
    * alternative readings disagree — SQL `=` makes it neither (null
    * comparison), a CASE-WHEN-ELSE-0 makes it a negative — so the
    * operator takes the one stance both engines state identically.
    */
  def contrastivePairs(anchors: DataFrame, corpus: DataFrame, idCol: String,
                       vecCol: String, labelCol: String,
                       kPos: Int, kNeg: Int): DataFrame = {
    val q = withNormalized(anchors.where(col(labelCol).isNotNull), vecCol, "qv")
      .select(col(idCol).as("anchor_id"), col(labelCol).as("anchor_label"),
        col("qv"))
    val c = withNormalized(corpus.where(col(labelCol).isNotNull), vecCol, "cv")
      .select(col(idCol).as("cand_id"), col(labelCol).as("cand_label"),
        col("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("cand_id") =!= col("anchor_id"))
      .withColumn("is_pos",
        (col("cand_label") === col("anchor_label")).cast("int"))
      .withColumn("cos", fastDot(corpus.sparkSession)(col("qv"), col("cv")))
    val w = Window.partitionBy(col("anchor_id"), col("is_pos"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where((col("is_pos") === 1 && col("rank") <= kPos) ||
        (col("is_pos") === 0 && col("rank") <= kNeg))
      .select("anchor_id", "cand_id", "is_pos", "rank")
  }

  /** The corpus-scale [[contrastivePairs]] path: candidates routed
    * through the IVF coarse quantizer instead of broadcast-scoring every
    * (anchor, candidate) pair. The corpus is assigned to its nearest
    * centroid cell once (map-side partial-agg argmax, ~N rows through the
    * exchange — [[VectorIVF.assign]]); each anchor probes its `nprobe`
    * closest cells ([[VectorIVF.probes]]); the candidate set is the
    * CELL-EQUALITY join of probes × assignments — never an anchors ×
    * corpus cross product, so the plan survives anchor sets far beyond
    * broadcast size. Scoring/splitting/ranking are the d116 window
    * unchanged: one (anchor, side) window over the candidates.
    *
    * Same null-label convention as [[contrastivePairs]] (dropped both
    * sides). Recall < 1 is the IVF trade: a positive/negative living in
    * an unprobed cell is missed — the d119/d123 oracle rows gate the
    * pair set and its recall against the exact path.
    *
    * With `nprobe >= K` (every cell probed) the candidate set is every
    * labeled pair and the output equals [[contrastivePairs]] exactly
    * (spec-pinned).
    */
  def contrastivePairsIVF(anchors: DataFrame, corpus: DataFrame,
                          idCol: String, vecCol: String, labelCol: String,
                          kPos: Int, kNeg: Int, centroids: DataFrame,
                          cellIdCol: String, cellVecCol: String,
                          nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    val nd = fastDot(spark) _
    val a = anchors.where(col(labelCol).isNotNull)
    val cells = VectorIVF.assign(corpus.where(col(labelCol).isNotNull),
        idCol, vecCol, centroids, cellIdCol, cellVecCol)
      .select(col(idCol).as("cand_id"), col(labelCol).as("cand_label"),
        col("cell"), col("__nv").as("cv"))
    val qp = VectorIVF.probes(a, idCol, vecCol, centroids, cellIdCol,
      cellVecCol, nprobe)
    // probes() carries only (query_id, cell, qv); the anchor label rides
    // in on an id-equality join — anchor-sized, shuffle-partitioned,
    // still no cross product anywhere
    val lbl = a.select(col(idCol).as("query_id"),
      col(labelCol).as("anchor_label"))
    // a candidate lives in exactly ONE cell, so a (anchor, candidate)
    // pair appears at most once across the nprobe probed cells — no
    // dedup step needed before the window
    val scored = qp.join(lbl, Seq("query_id"))
      .join(cells, Seq("cell"))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("is_pos",
        (col("cand_label") === col("anchor_label")).cast("int"))
      .withColumn("cos", nd(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"), col("is_pos"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where((col("is_pos") === 1 && col("rank") <= kPos) ||
        (col("is_pos") === 0 && col("rank") <= kNeg))
      .select(col("query_id").as("anchor_id"), col("cand_id"),
        col("is_pos"), col("rank"))
  }

  /** Embedding near-duplicate pairs above a cosine threshold, blocked by
    * `blockCol` (label, cluster id, LSH bucket...) so the self-join is an
    * equality join on the block key.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   blockCol: String, threshold: Double): DataFrame = {
    val base = withNormalized(df, vecCol, "v")
      .select(col(blockCol).as("blk"), col(idCol), col("v"))
    val a = base.select(col("blk"), col(idCol).as("id_a"), col("v").as("va"))
    val b = base.select(col("blk"), col(idCol).as("id_b"), col("v").as("vb"))
    a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", fastDot(df.sparkSession)(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("blk"))
  }

  /** Semantic decontamination: train rows whose embedding is within cosine
    * `threshold` of ANY benchmark vector — the embedding-space complement
    * of the 13-gram exact rule (`TextAnalysis.decontaminate`), catching
    * paraphrased/reformatted benchmark leakage that shares no verbatim
    * span. Returns (idCol, bench_hits) for contaminated train rows only;
    * `bench_hits` counts the benchmark vectors matched (useful for
    * severity triage before dropping).
    *
    * Scale shape: benchmark suites are tiny (thousands of rows) against a
    * 100 TB corpus, so `bench` broadcasts and the train side streams
    * map-only through a broadcast nested-loop; the sole exchange is the
    * final partial-agg count, carrying at most one row per contaminated
    * doc. Both sides are L2-normalized once ([[withNormalized]]) so the
    * per-pair work is a single codegen'd dot product.
    */
  def semanticDecontaminate(train: DataFrame, bench: DataFrame,
                            idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    val d = fastDot(train.sparkSession) _
    val t = withNormalized(train, vecCol, "__tv")
      .select(col(idCol), col("__tv"))
    val b = withNormalized(bench, vecCol, "__bv").select(col("__bv"))
    t.crossJoin(broadcast(b))
      .where(d(col("__tv"), col("__bv")) >= threshold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("bench_hits"))
  }

  /** Embedding quality gate: rows whose cosine to their group's centroid
    * falls below `minCos` — mislabeled or out-of-distribution vectors that
    * drag a cluster's coherence down (the SemDeDup paper's outlier
    * complement: instead of pruning the too-similar core, flag the
    * too-far fringe). Returns (idCol, labelCol) of the outliers.
    *
    * Scale shape: centroids are ONE partial-agg exchange — `dim` avg
    * aggregates per label, map-side combined, so the shuffle carries
    * O(labels × dim) doubles, never a per-row blow-up (no posexplode).
    * The centroid frame (≤ |labels| rows) broadcasts back for a map-only
    * cosine + filter. The vector width is probed from the first row — one
    * tiny driver action, same as the reference's collected plan scalars
    * (SURVEY.md §7.5.5).
    */
  def centroidOutliers(df: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, minCos: Double): DataFrame = {
    // probe only non-null vectors: the sampled row is partition-order
    // arbitrary, and size(NULL) would NPE the getInt
    val dimOpt = df.where(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0))
    dimOpt match {
      case None =>
        df.select(col(idCol), col(labelCol)).limit(0)
      case Some(dim) =>
        val d = fastDot(df.sparkSession) _
        val v = col("__v")
        val base = df.select(col(idCol), col(labelCol),
          col(vecCol).cast("array<double>").as("__v"))
        val cents = base.groupBy(col(labelCol))
          .agg(array((0 until dim).map(i => avg(v(i))): _*).as("__c"))
        base.join(broadcast(cents), Seq(labelCol))
          .where(d(v, col("__c")) / (sqrt(d(v, v)) * sqrt(d(col("__c"), col("__c"))))
            < minCos)
          .select(col(idCol), col(labelCol))
    }
  }

  /** Embedding-space drift census between two releases — the vector
    * modality's twin of [[Sampling.jensenShannon]]: per dimension, the
    * integer-grid mean and mean-square of each side plus the mean shift,
    * answering "did the embedding model or the data distribution move
    * between release P and reference Q" before any ANN index built on P
    * is trusted to serve Q-era centroids.
    *
    * Integer discipline: each component lands on the 1e-6 grid
    * (`round(v·1e6)` as a long — sums stay exact and partition-order-free
    * where float sums are not; Σ|g| ≤ rows·maxg keeps the per-dim sum in
    * long range through ~10^11 rows at |v| ≤ 10). Mean division is the
    * d133 signed form `sign·(|s| div n)` because component sums go
    * negative and truncating `div` (Spark) and floor `//` (DuckDB)
    * disagree below zero; the mean-square sum runs in decimal(38,0)
    * (g² ≤ 10^12 per component — past long range when summed at corpus
    * scale) and its division is non-negative, so plain `div` is safe.
    * `var_*_micro2 = E[g²] − E[g]²` (micro² units) can land a hair
    * negative on near-constant dimensions by truncation; emitted raw, the
    * replayable value.
    *
    * Plan: one posexplode + partial-agg census per side (the exchanges
    * carry ≤ dim rows per map task — map-side combine makes the shuffle
    * dim-sized, not corpus-sized), then a dim-sized full-outer join.
    * Ragged inputs are total: a dimension missing from a side reports
    * n=0 and zero moments.
    *
    * Returns one row per dimension: (dim, n_p, n_q, mean_p_micro,
    * mean_q_micro, dmean_micro, var_p_micro2, var_q_micro2).
    */
  def embeddingDrift(p: DataFrame, q: DataFrame, vecCol: String): DataFrame =
    embeddingDriftFromCensus(embeddingCensus(p, vecCol),
      embeddingCensus(q, vecCol))

  /** The census half of [[embeddingDrift]]: per-dimension (dim, n, s, ss)
    * integer-grid moments — n components seen, Σg as a long, Σg² in
    * decimal(38,0). Works on a streaming frame too (one update-mode agg,
    * state = dim rows), and a persisted census per release is the
    * standing artifact that answers drift with zero corpus passes (the
    * [[graft.functions.CorpusCatalog]] contract).
    */
  def embeddingCensus(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("__i", "__v")))
      .select(col("__i").cast("long").as("dim"),
        round(col("__v").cast("double") * lit(1e6), 0).cast("long").as("__g"))
      .groupBy("dim").agg(
        count(lit(1)).cast("long").as("n"),
        sum("__g").cast("long").as("s"),
        sum((col("__g").cast("decimal(38,0)") * col("__g"))).as("ss"))

  /** The grid-combine half of [[embeddingDrift]], over two ALREADY-BUILT
    * per-dimension censuses (the [[embeddingCensus]] schema) — shared by
    * the batch operator and the streaming drift twin, so live == batch
    * bit-for-bit by construction.
    */
  def embeddingDriftFromCensus(censusP: DataFrame,
                               censusQ: DataFrame): DataFrame = {
    def side(c: DataFrame, n: String, s: String, ss: String): DataFrame =
      c.select(col("dim").cast("long").as("dim"),
        col("n").cast("long").as(n), col("s").cast("long").as(s),
        col("ss").cast("decimal(38,0)").as(ss))
    val j = side(censusP, "n_p", "__sp", "__ssp")
      .join(side(censusQ, "n_q", "__sq", "__ssq"), Seq("dim"), "full_outer")
      .select(col("dim"),
        coalesce(col("n_p"), lit(0L)).as("n_p"),
        coalesce(col("n_q"), lit(0L)).as("n_q"),
        coalesce(col("__sp"), lit(0L)).as("__sp"),
        coalesce(col("__sq"), lit(0L)).as("__sq"),
        coalesce(col("__ssp"), lit(java.math.BigDecimal.ZERO)
          .cast("decimal(38,0)")).as("__ssp"),
        coalesce(col("__ssq"), lit(java.math.BigDecimal.ZERO)
          .cast("decimal(38,0)")).as("__ssq"))
    j.selectExpr("dim", "n_p", "n_q",
        ("CASE WHEN n_p = 0 THEN CAST(0 AS BIGINT) WHEN __sp >= 0" +
          " THEN __sp div n_p ELSE -((-__sp) div n_p) END AS mean_p_micro"),
        ("CASE WHEN n_q = 0 THEN CAST(0 AS BIGINT) WHEN __sq >= 0" +
          " THEN __sq div n_q ELSE -((-__sq) div n_q) END AS mean_q_micro"),
        ("CASE WHEN n_p = 0 THEN CAST(0 AS BIGINT)" +
          " ELSE CAST(__ssp div n_p AS BIGINT) END AS __msqp"),
        ("CASE WHEN n_q = 0 THEN CAST(0 AS BIGINT)" +
          " ELSE CAST(__ssq div n_q AS BIGINT) END AS __msqq"))
      .selectExpr("dim", "n_p", "n_q", "mean_p_micro", "mean_q_micro",
        "mean_p_micro - mean_q_micro AS dmean_micro",
        "__msqp - mean_p_micro * mean_p_micro AS var_p_micro2",
        "__msqq - mean_q_micro * mean_q_micro AS var_q_micro2")
  }
}
