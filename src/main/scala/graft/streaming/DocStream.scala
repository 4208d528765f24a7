package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Streaming document-pipeline stages: the training-data operators that
  * make sense incrementally. Everything here accepts a streaming OR batch
  * DataFrame — projections/filters are engine-agnostic, and the dedup stage
  * uses watermark-bounded state so it runs forever on a stream.
  */
object DocStream {

  /** Streaming exact dedup: keep the first arrival per content fingerprint;
    * duplicates arriving within the watermark window are dropped, and state
    * for a fingerprint is evicted once the watermark passes it — bounded
    * state on an unbounded stream (`dropDuplicatesWithinWatermark`), unlike
    * a global dropDuplicates whose state grows with history.
    */
  def dedupExact(docs: DataFrame, tsCol: String, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp_hex", TextAnalysis.fingerprintHex(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp_hex")

  /** Quality gate — a pure codegen'd projection, identical on batch and
    * stream (no state, no trigger coupling).
    */
  def qualityFilter(docs: DataFrame, minQuality: Double): DataFrame =
    docs.where(TextAnalysis.qualityScore(col("text")) >= minQuality)

  /** Per-language routing column for a partitioned sink
    * (`writeStream.partitionBy("lang_pred")`).
    */
  def withLanguage(docs: DataFrame): DataFrame =
    docs.withColumn("lang_pred", TextAnalysis.langIdHeuristic(col("text")))
}
