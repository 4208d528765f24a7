package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{MinHashLSH, TextAnalysis}

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

  /** Incremental near-duplicate tagging against a STATIC reference corpus:
    * "is this arriving doc a near-copy of anything we already hold?" — the
    * admission check a growing training set runs on every ingest.
    *
    * Streamability is the design constraint, and MinHash (not SimHash) is
    * the sketch that satisfies it: shingling, the k-seed signature, and LSH
    * band keys are pure projections ([[MinHashLSH]]), so the stream side is
    * STATELESS — no per-doc aggregation state, append mode throughout.
    * Candidates come from a stream-static equijoin on (band, bkey) against
    * the reference band table, the exact Jaccard verify joins the static
    * shingle arrays, and only pairs ≥ `minJaccard` emit. The reference
    * frames are plain static DataFrames recomputed per micro-batch unless
    * the caller persists them — at scale, persist (or pre-materialize) both.
    *
    * Statelessness trade, stated loudly: a (doc, ref) pair sharing several
    * band keys emits once per colliding band (≤ k/r rows). Collapsing
    * those inside the stream would mean keyed state; route the output
    * through `dropDuplicatesWithinWatermark` on (id, ref_id) if the stream
    * carries an event-time column, or dedup in the downstream batch pass.
    * Returns (idCol, ref_id, band, jaccard).
    */
  def nearDupTag(docs: DataFrame, refDocs: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text",
                 n: Int = 3, k: Int = 8, r: Int = 2,
                 minJaccard: Double = 0.5): DataFrame = {
    require(minJaccard > 0.0, // 0 would emit zero-overlap band collisions
      s"minJaccard=$minJaccard must be positive")
    val refSh = MinHashLSH.shingleArrays(refDocs, idCol, textCol, n)
    val refBands = MinHashLSH.bands(MinHashLSH.signatureArray(refSh, idCol, k), idCol, k, r)
      .withColumnRenamed(idCol, "ref_id")
    val refArr = refSh.select(col(idCol).as("ref_id"), col("sh_arr").as("ref_sh"))

    // Stream side: one projection carries the shingle array NEXT TO its
    // band keys (the batch helpers would drop it), built from the SAME
    // signatureCol/bandKeysCol definitions the reference side uses — the
    // two sides of the equijoin cannot drift.
    val sig = MinHashLSH.shingleArrays(docs, idCol, textCol, n)
      .withColumn("sig", MinHashLSH.signatureCol(col("sh_arr"), k))
    val banded = sig.select(col(idCol), col("sh_arr"),
        posexplode(MinHashLSH.bandKeysCol(col("sig"), k, r)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bkey")

    banded
      .join(refBands, Seq("band", "bkey")) // stream-static equijoin
      .join(refArr, Seq("ref_id"))         // static: attach ref shingles
      .withColumn("jaccard", MinHashLSH.jaccardCol(col("sh_arr"), col("ref_sh")))
      .where(col("jaccard") >= minJaccard)
      .select(col(idCol), col("ref_id"), col("band"), col("jaccard"))
  }

  /** Verbatim-span contamination tag as a STREAMING stage — the d35 rule
    * (any exact n-gram shared with a static held-out benchmark set) applied
    * per arriving doc. Stateless stream-static LEFT SEMI on the gram hash:
    * a doc emits (once) iff any of its grams hits the benchmark gram set,
    * making this the streaming complement of
    * [[graft.functions.TextAnalysis.ngramContamination]] (which rolls up
    * per-doc hit counts batch-side). The gram sides use the SAME native
    * [[graft.plans.ShingleHashes]] derivation, so stream and batch can
    * never drift. The benchmark frame is static and recomputed per
    * micro-batch unless the caller persists it — at scale, persist it.
    *
    * Statelessness trade, same as [[nearDupTag]]'s: a doc emits one row
    * PER colliding gram (streaming `dropDuplicates` would be unbounded
    * keyed state, not a stateless stage). Collapse downstream — a batch
    * `distinct`, or `dropDuplicatesWithinWatermark(idCol)` when the
    * stream carries an event-time column. Returns (idCol, sh).
    */
  def contaminationTag(docs: DataFrame, benchDocs: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       n: Int = 13): DataFrame = {
    val benchGrams = MinHashLSH.shingles(benchDocs, idCol, textCol, n)
      .select("sh").distinct()
    MinHashLSH.shingles(docs, idCol, textCol, n)
      .join(benchGrams, Seq("sh"), "left_semi")
      .select(col(idCol), col("sh"))
  }

  /** PII redaction as a streaming stage — a stateless projection
    * ([[TextAnalysis.redactPii]]), so batch ≡ stream. Runs LAST in
    * [[cleanStream]]: the gates and the dedup fingerprint see the raw
    * text exactly as the batch pipeline's do (d03/d14 fingerprint and
    * score pre-redaction), and the text that leaves the stream toward a
    * training sink is clean.
    */
  def redactStage(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))

  /** The full incremental cleaning stage: watermarked exact dedup →
    * quality gate → repetition gate → language routing → PII redaction,
    * one streaming DAG. Near-dup clustering is deliberately absent —
    * connected components need corpus-wide iteration and belongs in the
    * periodic batch pass (d12/d14), not per-microbatch state.
    */
  def cleanStream(docs: DataFrame, tsCol: String, watermark: String = "1 hour",
                  minQuality: Double = 0.3, maxRepetition: Double = 0.05,
                  redactPii: Boolean = true): DataFrame = {
    val gated = withLanguage(
      repetitionFilter(
        qualityFilter(dedupExact(docs, tsCol, watermark), minQuality),
        maxRepetition))
    if (redactPii) redactStage(gated) else gated
  }
}
