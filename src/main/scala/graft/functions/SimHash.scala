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
}
