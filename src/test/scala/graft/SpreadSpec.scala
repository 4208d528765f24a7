package graft

import org.apache.spark.sql.functions._

import graft.functions.{Spread, TextAnalysis}

/** [[graft.functions.Spread]] — the narrow-scan parallelism guard (r19
  * optimization): spreads a below-cores scan round-robin, is the identity
  * at or above the session's parallelism, and never changes what a
  * set-oriented consumer computes.
  */
class SpreadSpec extends SparkSpec {

  test("narrow frame spreads to the session's default parallelism") {
    val one = spark.range(100).toDF("id").coalesce(1)
    assert(one.rdd.getNumPartitions == 1)
    val spread = Spread.toCores(one)
    assert(spread.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("frame already at or above parallelism passes through unchanged") {
    val cores = spark.sparkContext.defaultParallelism
    val wide = spark.range(100).toDF("id").repartition(cores + 2)
    assert(Spread.toCores(wide) eq wide) // identity, no added exchange
  }

  test("guarded variant spreads narrow-over-scan, ignores exchange-rooted") {
    // a 1-partition LEAF (coalesce would be a Repartition node, which the
    // guard rightly treats as "parallelism already decided elsewhere")
    val narrow = spark.range(0, 100, 1, 1).toDF("id")
      .where(col("id") > 1).select(col("id"))
    assert(Spread.toCoresIfNarrowScan(narrow).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // a join-rooted frame must pass through UNTOUCHED (same instance):
    // probing it would materialize its AQE stages at plan time
    val joined = spark.range(50).toDF("id")
      .join(spark.range(50).toDF("id"), "id").coalesce(1)
    assert(Spread.toCoresIfNarrowScan(joined) eq joined)
  }

  test("set-oriented results are identical with and without the spread") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb aa"), (2L, "bb cc"), (3L, "aa bb aa"))
      .toDF("doc_id", "text").coalesce(1)
    def census(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bpePairCensus(df, "text")
        .orderBy("left_tok", "right_tok")
        .collect().toSeq
    assert(census(Spread.toCores(docs)) == census(docs))
  }
}
