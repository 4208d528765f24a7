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
    * (`writeStream.partitionBy("lang_pred")`). Multi-profile argmax
    * (en/fr/de/es) — stateless, so batch ≡ stream.
    */
  def withLanguage(docs: DataFrame): DataFrame =
    docs.withColumn("lang_pred", TextAnalysis.langId(col("text")))

  /** Repetition gate — the Gopher-style repetitious-text filter as a
    * stateless streaming stage (lambda-free column math, see
    * [[TextAnalysis.repetitionRatio]]).
    */
  def repetitionFilter(docs: DataFrame, maxRatio: Double): DataFrame =
    TextAnalysis.repetitionRatio(docs, "doc_id", "text")
      .where(col("rep_ratio") <= maxRatio)

  /** The full incremental cleaning stage: watermarked exact dedup →
    * quality gate → repetition gate → language routing, one streaming
    * DAG. Near-dup clustering is deliberately absent — connected
    * components need corpus-wide iteration and belongs in the periodic
    * batch pass (d12/d14), not per-microbatch state.
    */
  def cleanStream(docs: DataFrame, tsCol: String, watermark: String = "1 hour",
                  minQuality: Double = 0.3, maxRepetition: Double = 0.05): DataFrame =
    withLanguage(
      repetitionFilter(
        qualityFilter(dedupExact(docs, tsCol, watermark), minQuality),
        maxRepetition))
}
