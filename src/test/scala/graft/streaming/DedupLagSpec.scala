package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins `dropDuplicatesWithinWatermark`'s cross-batch rules (measured
  * round 19, before the d176 oracle was written) — the dedup-state twin
  * of [[WatermarkLagSpec]]'s two-watermark rule:
  *
  *  1. a duplicate arriving in a LATER micro-batch while the key's state
  *     is live (its expiry `first event time + delay` is above the
  *     evicting watermark) is DROPPED — dedup state survives batch
  *     boundaries;
  *  2. state eviction in batch N uses the watermark computed from batch
  *     N-1's event-time stats (the same lag WatermarkLagSpec pins for
  *     window state); a key re-sent in a batch AFTER the batch that
  *     evicted it is RE-EMITTED — the documented withinWatermark
  *     contract (bounded state trades away dedup beyond the horizon);
  *  3. the late-input filter lags one batch further (SPARK-40925): a row
  *     under THAT watermark is dropped before the operator regardless of
  *     dedup state.
  *
  * The d176 fixture only relies on regimes where these rules are
  * unambiguous (state definitively live, or eviction definitively
  * completed in an earlier batch). The mid-batch case — a duplicate
  * arriving in the very batch whose eviction watermark passes its
  * expiry — is pinned here too (state lookup wins: the row is dropped,
  * eviction runs after processing) but deliberately NOT used by any
  * oracle row, the q52 boundary-convention discipline.
  *
  * If a Spark upgrade changes any of this, these tests fail before the
  * d176 oracle mismatches, naming the semantics drift.
  */
class DedupLagSpec extends SparkSpec {

  private val base = 1700000040000L // minute-aligned, ms

  private def dedup(df: DataFrame): DataFrame =
    df.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")

  /** Collect emitted (key, minute-offset) pairs. */
  private def emitted(out: DataFrame): Seq[(String, Long)] =
    out.select(col("k"), col("ms")).collect()
      .map(r => (r.getString(0), (r.getLong(1) - base) / 60000L))
      .sorted.toSeq

  test("dedup state survives a micro-batch boundary: a duplicate in the " +
    "next batch is dropped while its key's expiry is above the evicting " +
    "watermark; a key evicted in an earlier batch re-emits") {
    import spark.implicits._
    val srcDir = graft.WorkDirs.acquire("test_deduplag")
    // batch 1: a@0 (expiry +10), b@28 (expiry +38), z1@30 -> wm1 = +20
    FileSource.writePinned(
      Seq(("a", base), ("b", base + 28 * 60000L), ("z1", base + 30 * 60000L))
        .toDF("k", "ms"),
      srcDir, "f0.parquet", 1500000000000L)
    // batch 2 (late filter 0, eviction wm1=+20): dup-a@31 — a's expiry
    // +10 is UNDER wm1, the mid-batch case: state lookup still sees it
    // (eviction runs after processing) -> dropped. dup-b@31 — b's expiry
    // +38 is above wm1, state live -> dropped (the survival rule).
    // z2@60 -> wm2 = +50
    FileSource.writePinned(
      Seq(("a", base + 31 * 60000L), ("b", base + 31 * 60000L + 1000L),
        ("z2", base + 60 * 60000L)).toDF("k", "ms"),
      srcDir, "f1.parquet", 1500000001000L)
    // batch 3 (late filter wm1=+20, eviction wm2=+50): a@56 — a was
    // definitively evicted in batch 2 (expiry +10 < wm1) -> RE-EMITS.
    // f@5 — under the late filter -> dropped before the operator.
    // z3@90 -> wm3 = +80; b (expiry +38 < wm2) evicts THIS batch.
    FileSource.writePinned(
      Seq(("a", base + 56 * 60000L), ("f", base + 5 * 60000L),
        ("z3", base + 90 * 60000L)).toDF("k", "ms"),
      srcDir, "f2.parquet", 1500000002000L)
    // batch 4 (late filter wm2=+50): b@85 — evicted in batch 3,
    // definitively -> RE-EMITS
    FileSource.writePinned(
      Seq(("b", base + 85 * 60000L)).toDF("k", "ms"),
      srcDir, "f3.parquet", 1500000003000L)
    val stream = spark.readStream
      .schema(Seq(("", 0L)).toDF("k", "ms").schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet").parquet(srcDir.toString)
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = emitted(StreamRunner.runToBatchMulti(dedup(stream),
      "deduplag", minDataBatches = 4))
    assert(got === Seq(("a", 0L), ("a", 56L), ("b", 28L), ("b", 85L),
      ("z1", 30L), ("z2", 60L), ("z3", 90L)))
  }
}
