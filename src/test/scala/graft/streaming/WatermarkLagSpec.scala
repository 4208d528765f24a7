package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the TWO-WATERMARK rule q51's oracle replays (measured round 19,
  * before the oracle was written): in micro-batch N, state EVICTION uses
  * the watermark computed from batch N-1's event-time stats, but the
  * LATE-EVENT input filter uses the watermark batch N-1 itself RAN with
  * — one batch older (Spark's SPARK-40925 design, which keeps chained
  * stateful operators consistent). Consequences the q51 fixture is built
  * on:
  *
  *  1. in a two-data-batch run the late filter is still the initial 0
  *     when batch 2 arrives — NOTHING can ever be dropped, and a batch-2
  *     row targeting a window that batch 2's own eviction closes still
  *     merges and emits (first test);
  *  2. the drop regime needs a THIRD data batch, whose late filter is
  *     the watermark batch 2 ran with (second test);
  *  3. an admitted late row folds into prior-batch window state, never
  *     opens a duplicate window (both tests' exact counts).
  *
  * If a Spark upgrade ever changes this rule, these tests fail before
  * the q51 oracle mismatches — the failure then names the semantics
  * drift instead of presenting as a row-hash diff.
  */
class WatermarkLagSpec extends SparkSpec {

  private def rates(df: DataFrame): DataFrame =
    df.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute").as("win"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").cast("long").as("ws"), col("k"), col("n"))

  private val base = 1700000040000L // minute-aligned

  /** Collect (window-minute-offset, count) pairs. */
  private def minutes(out: DataFrame): Seq[(Long, Long)] =
    out.collect().map(r => ((r.getLong(0) - base / 1000) / 60, r.getLong(2)))
      .sorted.toSeq

  test("two data batches: the late filter is still 0 - a row arriving " +
    "after its window's watermark passage still merges and emits") {
    import spark.implicits._
    val srcDir = graft.WorkDirs.acquire("test_wmlag_two")
    // batch 1: minute 0 and minute 30 -> eviction wm for batch 2 = +20min
    FileSource.writePinned(
      Seq((base, 1), (base + 30 * 60000L, 1)).toDF("ms", "k"),
      srcDir, "f0.parquet", 1500000000000L)
    // batch 2: a row in minute 0 — 20 minutes "late", yet admitted
    // (late filter lags at 0) and merged into batch-1 state; batch 2's
    // eviction (wm +20min) then closes window 0 WITH it
    FileSource.writePinned(
      Seq((base + 1000L, 1), (base + 120 * 60000L, 1)).toDF("ms", "k"),
      srcDir, "f1.parquet", 1500000001000L)
    val stream = spark.readStream
      .schema(Seq((0L, 0)).toDF("ms", "k").schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet").parquet(srcDir.toString)
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = minutes(StreamRunner.runToBatchMulti(rates(stream),
      "wmlag_two", minDataBatches = 2))
    // window 0 emits ONCE with BOTH rows; window 30 closes under the
    // final wm (+110min); window 120 stays open
    assert(got === Seq((0L, 2L), (30L, 1L)))
  }

  test("three data batches: batch 3's late filter is the watermark " +
    "batch 2 ran with - closed-window rows drop, open-window rows merge") {
    import spark.implicits._
    val srcDir = graft.WorkDirs.acquire("test_wmlag_three")
    // batch 1: minute 0, minute 25 and minute 30 -> wm1 = +20min
    FileSource.writePinned(
      Seq((base, 1), (base + 25 * 60000L, 1), (base + 30 * 60000L, 1))
        .toDF("ms", "k"),
      srcDir, "f0.parquet", 1500000000000L)
    // batch 2 (late filter 0, eviction wm1=+20): emits window 0; windows
    // 25/30/60 stay open (end > +20)
    FileSource.writePinned(
      Seq((base + 60 * 60000L, 1)).toDF("ms", "k"),
      srcDir, "f1.parquet", 1500000001000L)
    // batch 3 (late filter wm1=+20, eviction wm2=+50): minute 5 is DROPPED
    // (end +6 <= +20; admitting it would resurrect emitted window 0's
    // neighbourhood and double-emit), minute 25 MERGES into open batch-1
    // state (end +26 > +20) and emits this very batch (end <= +50);
    // minute 90 advances the final wm to +80
    FileSource.writePinned(
      Seq((base + 5 * 60000L, 1), (base + 25 * 60000L + 1000L, 1),
        (base + 90 * 60000L, 1)).toDF("ms", "k"),
      srcDir, "f2.parquet", 1500000002000L)
    val stream = spark.readStream
      .schema(Seq((0L, 0)).toDF("ms", "k").schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet").parquet(srcDir.toString)
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = minutes(StreamRunner.runToBatchMulti(rates(stream),
      "wmlag_three", minDataBatches = 3))
    // minute 5 absent (dropped); minute 25 counted TWICE (cross-batch
    // merge); 60 closes under the final wm +80; 90 stays open
    assert(got === Seq((0L, 1L), (25L, 2L), (30L, 1L), (60L, 1L)))
  }
}
