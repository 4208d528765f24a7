package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet-backed table loader.
  *
  * The reference loads each Cassandra table through a typed scan
  * (`Java/.../DataLoader.java:508-529`, `Scala/.../DatabaseLoad.scala:34-39`);
  * here the storage is Parquet and the catalog is a directory of
  * `<name>.parquet` files. Filters/projections applied by callers are pushed
  * into the Parquet scan by Catalyst (PushedFilters / ReadSchema), which at
  * 100 TB is what replaces the connector's CQL pushdown: row-group and page
  * skipping on min/max stats.
  */
object Tables {

  /** Scan one table. Lazy — nothing is read until an action runs. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scan with an explicit expected schema (the reference's
    * `DatabaseLoad.scala:34-39` pattern). Spark then prunes/validates columns
    * at plan time instead of failing at runtime.
    */
  def load(spark: SparkSession, dir: String, name: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(s"$dir/$name.parquet")

  /** Scan the `events` table, normalizing its TIMESTAMP(NANOS) parquet column
    * (which Spark 4 rejects outright) to a standard microsecond TIMESTAMP.
    * Set per-session at runtime so this works under the driver's own
    * SparkSession too. Truncation ns→µs is a floor, matching DuckDB's.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }

  /** Scan `events` keeping `ts` as the RAW epoch-nanos long. Preferred for
    * time-bounded batch queries: a per-row ns→timestamp conversion is an
    * expression barrier that stops `ts` predicates from reaching the
    * parquet scan (no PushedFilters → no row-group/page skipping on the
    * time axis — fatal at 100 TB). Raw longs order identically; convert the
    * BOUND with [[nanos]] instead of converting the column.
    */
  def loadEventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  /** Epoch-nanos for a 'yyyy-MM-dd HH:mm:ss' UTC literal — the driver-side
    * bound for [[loadEventsRaw]] comparisons (matches engines that compare
    * TIMESTAMP literals against ns-precision columns at ns precision).
    */
  def nanos(utc: String): Long = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    java.time.LocalDateTime.parse(utc, fmt)
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
  }
}
