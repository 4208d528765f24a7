package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for approximate nearest-neighbor search over
  * embedding columns — the scale path past [[VectorOps.knnBruteForce]]
  * (which is O(|q|·|corpus|)) when the query set is no longer small.
  *
  * Plan shape mirrors [[MinHashLSH]] deliberately: per-row signature
  * (map-only, codegen'd), band keys (map-only posexplode), candidate
  * generation via an equality join on (band, bkey) — never a cross
  * product — then exact cosine only on candidates. At 100 TB the corpus
  * bucketing is embarrassingly parallel and the only shuffle touching the
  * corpus is the band-key join.
  *
  * The m hyperplanes are pseudo-random but DERIVED from md5("p:d") at plan
  * time — plain literals in the plan (zero runtime hashing), and any SQL
  * engine can regenerate them for verification.
  */
object VectorLSH {

  /** Component d of hyperplane p: md5-derived uniform value in [-1, 1]
    * (exactly `(md5("p:d")[0:7] % 2001 - 1000) / 1000`).
    */
  def planeValue(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hx = md.digest(s"$p:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hx.substring(0, 7), 16) % 2001 - 1000) / 1000.0
  }

  def hyperplanes(m: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(m, dim)(planeValue)

  /** Sign-bit signature: bit p set iff dot(vec, plane_p) >= 0. One long
    * column, m·dim multiply-adds per row, all inside codegen via the
    * native [[graft.plans.DotProduct]] expression.
    */
  def bucketBits(vec: Column, planes: Array[Array[Double]],
                 dotFn: (Column, Column) => Column = VectorOps.dot): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      when(dotFn(vec, lit(plane)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Johnson–Lindenstrauss random projection to `k` dimensions — the
    * embedding-compression pass before storage or a cheaper ANN index
    * (Achlioptas 2001/2003 showed database-friendly ±1/uniform entries
    * suffice; the scaling `sqrt(3/k)` makes E‖y‖² = ‖x‖² for the same
    * uniform[-1,1] entries the LSH planes already use). The projection
    * matrix is [[planeValue]]'s md5 literals — plan constants any engine
    * regenerates — and each component is the native codegen'd
    * [[graft.plans.DotProduct]] over the same sequential fold a SQL
    * `list_reduce` replays, so outputs are bit-replayable, not just
    * approximately equal. Map-only: no shuffle at any scale.
    * Returns (idCol, j, y) — one row per output dimension, `y` on the
    * 1e-6 grid.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, dim: Int = -1): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val d = if (dim > 0) Some(dim) else firstVectorLength(df, vecCol)
    d match {
      case None =>
        df.select(col(idCol), lit(0).as("j"), lit(0.0).as("y")).limit(0)
      case Some(n) =>
        val nativeDot = graft.plans.VectorExpressions
          .dotColumn(df.sparkSession, _: Column, _: Column)
        val scale = math.sqrt(3.0 / k)
        val comps = array(hyperplanes(k, n).map(plane =>
          round(lit(scale) * nativeDot(col(vecCol).cast("array<double>"),
            lit(plane)), 6)): _*)
        df.select(col(idCol), posexplode(comps))
          .withColumnRenamed("pos", "j")
          .withColumnRenamed("col", "y")
    }
  }

  /** Band keys from the bit signature: band b holds bits
    * [b·rb, (b+1)·rb). Returns (idCol, band, bkey) — map-only.
    */
  def bands(df: DataFrame, idCol: String, vecCol: String,
            m: Int = 16, rb: Int = 4, dim: Int = -1): DataFrame = {
    require(m % rb == 0, s"m=$m must be a multiple of rb=$rb")
    val d = if (dim > 0) Some(dim) else firstVectorLength(df, vecCol)
    val nativeDot = graft.plans.VectorExpressions.dotColumn(df.sparkSession, _: Column, _: Column)
    d match {
      case None => // empty input: no rows, stable schema
        df.select(col(idCol), lit(0).as("band"), lit(0L).as("bkey")).limit(0)
      case Some(n) =>
        val bits = bucketBits(col(vecCol).cast("array<double>"), hyperplanes(m, n), nativeDot)
        val mask = (1L << rb) - 1
        val keys = array((0 until m / rb).map(b =>
          shiftright(col("bits"), b * rb).bitwiseAND(lit(mask))): _*)
        df.select(col(idCol), bits.as("bits"))
          .select(col(idCol), posexplode(keys))
          .withColumnRenamed("pos", "band")
          .withColumnRenamed("col", "bkey")
    }
  }

  /** Approximate top-k cosine neighbors: candidates = corpus vectors
    * sharing ≥1 LSH band with the query, exact cosine + rank only on those.
    * Returns (query_id, neighbor_id, rank). Recall < 1 by construction —
    * that is the LSH trade; raise m/lower rb for more candidates.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, m: Int = 16, rb: Int = 4): DataFrame = {
    // probe the (fixed) vector width once for both band computations
    val dim = firstVectorLength(corpus, vecCol)
      .orElse(firstVectorLength(queries, vecCol)).getOrElse(0)
    val qb = bands(queries, idCol, vecCol, m, rb, dim)
      .withColumnRenamed(idCol, "query_id")
    val cb = bands(corpus, idCol, vecCol, m, rb, dim)
      .withColumnRenamed(idCol, "neighbor_id")
    val cand = qb.join(cb, Seq("band", "bkey"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val q = VectorOps.withNormalized(queries, vecCol, "qv")
      .select(col(idCol).as("query_id"), col("qv"))
    val c = VectorOps.withNormalized(corpus, vecCol, "cv")
      .select(col(idCol).as("neighbor_id"), col("cv"))
    // No broadcast hint on the query side: this operator exists for when
    // the query set outgrows the brute-force path, so forcing a broadcast
    // would be an OOM risk at exactly its target scale — AQE broadcasts
    // small query sets at runtime anyway.
    val scored = cand.join(q, Seq("query_id")).join(c, Seq("neighbor_id"))
      .withColumn("cos",
        graft.plans.VectorExpressions.dotColumn(corpus.sparkSession, col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Near-duplicate embedding pairs WITHOUT a blocking key: candidates from
    * the LSH band equijoin (never a cross product), exact cosine gate on
    * candidates only. The unblocked complement of
    * [[VectorOps.nearDupPairs]] — use when no natural blocking column
    * exists; recall is bounded by the band collision probability (raise m /
    * lower rb to trade cost for recall). Returns (id_a, id_b), id_a < id_b.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   minCos: Double, m: Int = 16, rb: Int = 4): DataFrame = {
    val dim = firstVectorLength(df, vecCol).getOrElse(0)
    val b = bands(df, idCol, vecCol, m, rb, dim)
    val cand = b.select(col(idCol).as("id_a"), col("band"), col("bkey"))
      .join(b.select(col(idCol).as("id_b"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val nrm = VectorOps.withNormalized(df, vecCol, "__nv")
    val scored = cand
      .join(nrm.select(col(idCol).as("id_a"), col("__nv").as("__va")), Seq("id_a"))
      .join(nrm.select(col(idCol).as("id_b"), col("__nv").as("__vb")), Seq("id_b"))
      .withColumn("__cos", graft.plans.VectorExpressions
        .dotColumn(df.sparkSession, col("__va"), col("__vb")))
    scored.where(col("__cos") >= minCos).select("id_a", "id_b")
  }

  /** Cross-set near-duplicate embedding pairs — the vector-modality twin
    * of [[JaccardJoin.similarPairsAcross]]: candidates come ONLY from
    * r-band × s-band collisions, so the s×s (corpus-internal) candidate
    * volume a self-join of `r ∪ s` would generate, verify, and discard is
    * never formed — with a small held-out set against a duplicate-heavy
    * corpus that discarded volume dominates (measured for the text twin in
    * SCALE.md). Ids may overlap between sides (the pair is (r-id, s-id),
    * not ordered); rows where both sides are the same id are dropped.
    * Returns (id_a, id_b, cos) with `id_a` from `r`, `id_b` from `s`.
    */
  def nearDupPairsAcross(r: DataFrame, s: DataFrame, idCol: String,
                         vecCol: String, minCos: Double,
                         m: Int = 16, rb: Int = 4): DataFrame = {
    // Tag + union so each input is scanned (and its vectors cast) ONCE,
    // with ALL the per-row work — the m×dim signature dots and the L2
    // normalization — done in one projection over the union instead of
    // one banding pass + one normalization pass per side. (r and s are
    // typically filters of the same parent table; the old per-side shape
    // rescanned that parent 4×.) Bits stay computed on the RAW vector —
    // sign(dot(v, plane)) equals sign(dot(v/‖v‖, plane)) mathematically
    // but not in floating point near 0, and the verification oracle
    // replays the raw-vector signature byte-for-byte.
    def side(df: DataFrame, isR: Boolean) =
      df.select(col(idCol).as("__id"), lit(isR).as("__r"),
        col(vecCol).cast("array<double>").as("__v"))
    val tagged = side(r, isR = true).unionByName(side(s, isR = false))
    firstVectorLength(tagged, "__v") match {
      case None => // both sides empty: no rows, stable schema
        r.select(col(idCol).as("id_a")).limit(0)
          .crossJoin(s.select(col(idCol).as("id_b")).limit(0))
          .withColumn("cos", lit(0.0))
      case Some(dim) =>
        val nativeDot = graft.plans.VectorExpressions
          .dotColumn(r.sparkSession, _: Column, _: Column)
        // compact prepared frame (id, side, bits, nv), persisted: read by
        // the two band splits and the two verify sides below
        val prepared = graft.CacheRegistry.track(
          VectorOps.withNormalized(tagged, "__v", "__nv")
            .withColumn("__bits",
              bucketBits(col("__v"), hyperplanes(m, dim), nativeDot))
            .select("__id", "__r", "__bits", "__nv")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val mask = (1L << rb) - 1
        val keys = array((0 until m / rb).map(b =>
          shiftright(col("__bits"), b * rb).bitwiseAND(lit(mask))): _*)
        def bandsOf(isR: Boolean, outId: String) = prepared
          .where(col("__r") === isR)
          .select(col("__id"), posexplode(keys))
          .select(col("__id").as(outId), col("pos").as("band"), col("col").as("bkey"))
        val cand = bandsOf(isR = true, "id_a")
          .join(bandsOf(isR = false, "id_b"), Seq("band", "bkey"))
          .where(col("id_a") =!= col("id_b"))
          .select("id_a", "id_b")
          .distinct()
        val scored = cand
          .join(prepared.where(col("__r"))
            .select(col("__id").as("id_a"), col("__nv").as("__va")), Seq("id_a"))
          .join(prepared.where(!col("__r"))
            .select(col("__id").as("id_b"), col("__nv").as("__vb")), Seq("id_b"))
          .withColumn("cos", nativeDot(col("__va"), col("__vb")))
        scored.where(col("cos") >= minCos).select("id_a", "id_b", "cos")
    }
  }

  /** Vector length probed from the first row (None when empty) — embeddings
    * are fixed-width; one tiny driver-side action, exactly like the
    * reference's collected plan scalars (SURVEY.md §7.5.5).
    */
  private def firstVectorLength(df: DataFrame, vecCol: String): Option[Int] =
    df.select(size(col(vecCol))).limit(1).collect().headOption.map(_.getInt(0))
}
