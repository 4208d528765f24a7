package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Partitioned + sorted parquet layout writers — SCALE.md's data-layout
  * contract as code instead of prose.
  *
  * At 100 TB the reconstruction family is O(epoch) only if the delta log is
  * laid out for it: hive-partitioned by `uevol_message_id` (a query for one
  * message type never opens other partitions' files — partition pruning)
  * and sorted within files by `instance_message_id` (the
  * `[snap_start, target]` slice skips row groups via parquet min/max
  * stats). The reference gets the same effect from Cassandra's clustering
  * keys; this is the parquet equivalent.
  */
object TableWriter {

  /** Generic partitioned + sorted writer: one task per partition value
    * cluster (repartition on the partition columns so each hive partition
    * is written by the tasks that own it, not splattered across all of
    * them), rows sorted within each file for row-group skipping on
    * `sortCols`.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partCols: Seq[String], sortCols: Seq[String]): Unit =
    df.repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** The delta-log layout (`instance_field`): partition by message type,
    * sort by instance id.
    */
  def writeDeltaLog(df: DataFrame, path: String): Unit =
    writePartitioned(df, path, Seq("uevol_message_id"), Seq("instance_message_id"))

  /** Deterministic shard writer — the sequence-writer output stage: rows
    * land in `nShards` md5-assigned shards (stable across runs, engines
    * and partitionings — [[graft.functions.Sampling.hashValue]]'s
    * property, so an interrupted job rewrites IDENTICAL shards), one file
    * per shard via repartition-by-shard, rows ordered inside each file by
    * `sortCols` (e.g. the packed-sequence key, so a training reader
    * streams sequences in layout order). Hive-partitioned by `shard` —
    * a reader can open any subset of shards independently, which is the
    * contract data-loader sharding needs.
    */
  def writeShards(df: DataFrame, path: String, idCol: String, nShards: Int,
                  sortCols: Seq[String] = Nil): Unit = {
    require(nShards > 0, s"nShards=$nShards must be positive")
    val sharded = df.withColumn("shard",
      org.apache.spark.sql.functions.pmod(
        graft.functions.Sampling.hashValue(col(idCol)),
        org.apache.spark.sql.functions.lit(nShards.toLong)))
    writePartitioned(sharded, path, Seq("shard"), sortCols)
  }

  /** Z-ordered layout: rows clustered by the Morton interleave of two
    * dimension columns ([[graft.ops.ZOrder.zValue]]), range-partitioned
    * into `nFiles` files and sorted within each — every file's parquet
    * min/max stats then bound BOTH dimensions tightly (a contiguous
    * z-range is a small bounding box in each dimension), so a filter on
    * either column prunes files and row groups. One range exchange — the
    * same shuffle any sorted write pays; Delta's `OPTIMIZE ZORDER BY`
    * effect with no table-format dependency. `a`/`b` must already lie on
    * the z-grid (see [[graft.ops.ZOrder.normalize]]).
    */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
                    bits: Int = 16, nFiles: Int = 64): Unit =
    df.withColumn("__z", graft.ops.ZOrder.zValue(col(a), col(b), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Bucketed catalog table: `numBuckets` hash buckets on `bucketCols`,
    * sorted within buckets — the co-located-join layout. Two tables
    * bucketed the same way join WITHOUT a shuffle on either side (Spark
    * plans bucket-wise joins when bucket specs match), which at 100 TB
    * removes the single largest exchange from any repeated fact-to-fact
    * join (e.g. instance_field ⋈ instance_message on the id). Bucketing
    * lives in the session catalog (`saveAsTable`) — plain `.parquet(path)`
    * cannot carry the bucket metadata.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy((if (sortCols.nonEmpty) sortCols else bucketCols).head,
        (if (sortCols.nonEmpty) sortCols else bucketCols).tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
