package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 32-bit SimHash document sketches.
  *
  * Each token contributes ±1 to each of 32 bit-counters according to its
  * md5-derived 32-bit hash; the sketch bit is 1 where the counter is
  * positive. One explode + one aggregation — map-side combinable, so the
  * shuffle carries ≤ one row per doc regardless of corpus size.
  */
object SimHash {

  /** md5-derived 32-bit token hash (same derivation as MinHashLSH seeds=0). */
  def tokenHash(tok: Column): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long")

  /** md5-derived 64-bit token hash: two 32-bit chunks assembled sign-aware
    * (a base-10 `conv` of 16 hex chars would overflow Long; the high chunk
    * is re-signed before the shift-by-multiply so every partial result
    * stays in BIGINT range — the same closed form the DuckDB oracles use).
    */
  def tokenHash64(tok: Column): Column = {
    val hi = conv(substring(md5(tok), 1, 8), 16, 10).cast("long")
    val lo = conv(substring(md5(tok), 9, 8), 16, 10).cast("long")
    (hi - when(hi >= 2147483648L, lit(4294967296L)).otherwise(lit(0L))) *
      lit(4294967296L) + lo
  }

  private def sketch(df: DataFrame, idCol: String, textCol: String,
                     width: Int, hash: Column => Column): DataFrame = {
    val toks = df.select(col(idCol), explode(split(lower(col(textCol)), " ")).as("tok"))
      .withColumn("h", hash(col("tok")))
    // The ±1 counter s_i = 2·cnt1_i − n, so its sign test s_i > 0 is
    // 2·cnt1_i > n: per-row agg work becomes a branch-free shift-and-mask
    // sum per bit (no CaseWhen in the hot hash-agg update loop) plus ONE
    // shared row count. Same sketch bit for bit, including the tie rule
    // (s_i = 0 ⟺ 2·cnt1 = n → bit 0).
    val bitCnts = (0 until width).map { i =>
      sum(shiftright(col("h"), i).bitwiseAND(1)).as(s"c$i")
    }
    // distinct powers of two sum left-to-right without overflow; the top
    // term is Long.MinValue (two's complement sign bit), added last
    val assembled = (0 until width).map { i =>
      when(col(s"c$i") * 2 > col("n"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n"), bitCnts: _*)
      .select(col(idCol), assembled.as("simhash"))
  }

  /** 32-bit SimHash over whitespace tokens, one row per `idCol`. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    sketch(df, idCol, textCol, 32, tokenHash)

  /** 64-bit SimHash — the production width: 16-bit band keys at k=3 give
    * 65536 buckets per band, sub-quadratic banding to ~10^8 docs.
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame =
    sketch(df, idCol, textCol, 64, tokenHash64)

  /** Hamming distance between two sketches (for near-dup banding/filtering). */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs with hamming distance ≤ `maxHamming`:
    * the sketch splits into `maxHamming + 1` bands, and by pigeonhole any
    * pair within the distance budget agrees EXACTLY on at least one band —
    * so candidates come from a (band, bandKey) EQUIJOIN over the sketch
    * table (never an all-pairs product), and the exact hamming check runs
    * on candidates only. The same candidates-then-verify shape as
    * [[MinHashLSH.nearDupPairs]], on a 1-word sketch. Returns
    * (id_a, id_b, hamming), id_a < id_b.
    *
    * Scale note: band-key cardinality is 2^(width/(maxHamming+1)) — the
    * 32-bit sketch at k=3 gives 256 buckets per band, sub-quadratic only
    * to ~10^5 docs; use [[nearDupPairs64]] (16-bit bands, 65536 buckets)
    * for corpus scale.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame =
    bandedPairs(simhash(df, idCol, textCol), idCol, 32, maxHamming)

  /** [[nearDupPairs]] on the 64-bit sketch — 16-bit band keys at the
    * default k=3, the corpus-scale variant.
    */
  def nearDupPairs64(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3): DataFrame =
    bandedPairs(simhash64(df, idCol, textCol), idCol, 64, maxHamming)

  /** The banding + verify machinery over an ALREADY-COMPUTED sketch
    * column — the same pigeonhole candidate generation [[nearDupPairs64]]
    * runs on text SimHashes, opened to any fixed-width bit sketch (e.g.
    * a perceptual image hash from [[Multimodal.dHash64]]): split into
    * `maxHamming + 1` bands, candidates from the (band, key) EQUIJOIN
    * (never all-pairs), exact hamming verify on candidates only.
    * Returns (id_a, id_b, hamming), id_a < id_b.
    */
  def hammingPairs(sketch: DataFrame, idCol: String, sketchCol: String,
                   width: Int, maxHamming: Int = 3): DataFrame =
    bandedPairs(
      sketch.select(col(idCol), col(sketchCol).cast("long").as("simhash")),
      idCol, width, maxHamming)

  /** The band-key ARRAY for a fixed-width bit sketch under pigeonhole
    * banding: band b = bits [b·bw, (b+1)·bw), the tail band keeping the
    * remainder bits so every bit belongs to exactly one band. The SINGLE
    * key derivation shared by the self-join ([[hammingPairs]]) and the
    * stream-static tag ([[graft.streaming.DocStream.mediaDupTag]]), so
    * the two sides of a band equijoin can never drift. shiftright
    * sign-extends on the 64-bit sketch's negative values; the mask makes
    * the key exact either way. A full-width band (maxHamming=0 on the
    * 64-bit sketch) masks with -1: (1L << 64) wraps to 1, which would
    * zero every key and degenerate the equijoin into all-pairs.
    */
  def bandKeys(sketch: Column, width: Int, maxHamming: Int): Column = {
    require(maxHamming >= 0 && maxHamming < width,
      s"maxHamming=$maxHamming out of [0,$width)")
    val nBands = maxHamming + 1
    val bw = width / nBands
    array((0 until nBands).map { b =>
      val bits = if (b == nBands - 1) width - b * bw else bw
      val mask = if (bits >= 64) -1L else (1L << bits) - 1
      shiftright(sketch, b * bw).bitwiseAND(lit(mask))
    }: _*)
  }

  private def bandedPairs(sh: DataFrame, idCol: String, width: Int,
                          maxHamming: Int): DataFrame = {
    val keys = bandKeys(col("simhash"), width, maxHamming)
    // persisted before the self-join (the S4 rule, as in
    // MinHashLSH.nearDupPairs): both join sides read it, and the sketch
    // aggregation behind it is the dominant cost
    val bands = graft.CacheRegistry.track(
      sh.select(col(idCol), col("simhash"), posexplode(keys))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "bkey")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cand = bands.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
        col("band"), col("bkey"))
      .join(bands.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
        col("band"), col("bkey")), Seq("band", "bkey"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .distinct()
    cand.withColumn("hamming", hamming(col("sh_a"), col("sh_b")))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
  }
}
