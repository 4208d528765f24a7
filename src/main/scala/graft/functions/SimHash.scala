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

  /** SimHash over whitespace tokens of `textCol`, one row per `idCol`. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(split(lower(col(textCol)), " ")).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val bitSums = (0 until 32).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$i")
    }
    val assembled = (0 until 32).map { i =>
      when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    toks.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), assembled.as("simhash"))
  }

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
    * Scale note: band-key cardinality is 2^(32/(maxHamming+1)) — with the
    * 32-bit sketch and k=3 that is 256 buckets per band, which stays
    * sub-quadratic only up to ~10^5 docs. For corpus-scale dedup widen the
    * sketch (64-bit, ~16-bit bands, the standard production shape) — the
    * banding algebra here is width-agnostic; [[MinHashLSH.nearDupPairs]]
    * is the shipped corpus-scale path.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, s"maxHamming=$maxHamming out of [0,32)")
    val nBands = maxHamming + 1
    val width = 32 / nBands
    val sh = simhash(df, idCol, textCol)
    val mask = (1L << width) - 1
    // band b = bits [b*width, (b+1)*width); the tail band keeps the
    // remainder bits so every bit belongs to exactly one band
    val keys = array((0 until nBands).map { b =>
      val m = if (b == nBands - 1) (1L << (32 - b * width)) - 1 else mask
      shiftright(col("simhash"), b * width).bitwiseAND(lit(m))
    }: _*)
    val bands = sh.select(col(idCol), col("simhash"), posexplode(keys))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bkey")
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
