package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** End-to-end checks for the round-19 boundary rows at sf0.001 — the
  * multiset each row's DuckDB oracle replays, asserted in-suite so a
  * semantics drift fails here (naming the class that moved) before it
  * presents as a driver row-hash diff.
  */
class BoundaryQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("d176: dedup state survives the batch boundary (dupD absent), the " +
    "late filter drops F, and the evicted cohort E re-emits — the " +
    "closed-form multiset") {
    // MULTISET compare (sorted seq): a double-emission of the same
    // (k, tms) would survive a Set compare
    val out = SparkEntry.queries("d176_dedup_boundary_stream")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val e = graft.io.Tables.loadEventsRaw(spark, sf)
    val dt = e.schema("ts").dataType
    val base = e.select(col("event_id").as("k"),
      unix_micros(graft.io.Tables.asTimestamp(dt, "ts")).as("tus"))
    val r = base.agg(min("tus"), max("tus")).head()
    val (mnUs, mxUs) = (r.getLong(0), r.getLong(1))
    val midUs = (mnUs + mxUs) / 2
    val real = base.collect().map(x => (x.getLong(0), x.getLong(1) / 1000L))
    val expected = (real ++
      (0 until 60).map(i => (3000000000L + i, midUs / 1000L)) ++
      (0 until 5).map(i => (4600000000L + i, (mxUs + 1200000000L) / 1000L)) ++
      (0 until 30).map(i => (5000000000L + i, (mxUs + 1500000000L) / 1000L))
      ).sorted.toSeq
    assert(out === expected)
    // the negative classes, named: no dupD key (4.0e9 block) and no
    // late-cohort key (4.5e9 block) ever reached the sink
    assert(!out.exists { case (k, _) =>
      k >= 4000000000L && k < 4600000000L })
  }

  test("q54: the RocksDB provider reproduces q52's session-boundary " +
    "output bit for bit (provider changes where state lives, never " +
    "what it holds)") {
    // MULTISET compare: one user can hold several sessions with
    // identical stats, so a Set would mask a lost/duplicated session
    def rows(name: String): Seq[(Long, Long, Long, Double)] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(r.fieldIndex("user_id")),
          r.getLong(r.fieldIndex("n_events")),
          r.getLong(r.fieldIndex("duration_s")),
          r.getDouble(r.fieldIndex("sum_value")))).sorted.toSeq
    val heap = rows("q52_session_boundary_stream")
    val rocks = rows("q54_session_rocksdb_boundary")
    assert(heap.nonEmpty)
    assert(rocks === heap)
    // the provider toggle must not leak into the session after the row
    assert(!graft.GraftConf.rocksDbStateStoreEnabled(spark))
  }
}
