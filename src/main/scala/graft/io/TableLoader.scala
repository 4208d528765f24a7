package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Acquisition mode — the reference's replay switch.
  *
  * `replay = 1` swaps the fact-table pair for its `*_replay` twin
  * (`SQL/GetMessage.sql:17-23`, `Java/.../DataLoader.java:57,143`), and the
  * catalog tables carry per-row participation flags
  * (`playback_activated` / `online_activated`,
  * `DataLoader.java:225-226,285-286,375-376`) marking which equipment /
  * messages / fields take part in each mode.
  */
sealed abstract class AcquisitionMode(val suffix: String, val flag: String)

/** Live acquisition: base tables, `online_activated` rows. */
case object Online extends AcquisitionMode("", "online_activated")

/** Playback of recorded data: `*_replay` tables, `playback_activated` rows. */
case object Replay extends AcquisitionMode("_replay", "playback_activated")

object AcquisitionMode {
  /** Catalog rows participating in `mode` — the reference applies this to
    * uevol_field / uevol_message / uevol_equipment before any fact lookup.
    */
  def activated(catalog: DataFrame, mode: AcquisitionMode): DataFrame =
    catalog.where(col(mode.flag))
}

/** Storage-connector seam (SURVEY.md §7.1): queries name tables, a loader
  * binds them to storage. [[ParquetLoader]] is the shipped backend; a
  * Cassandra (or any DataSourceV2) loader slots in behind the same trait
  * without touching query code.
  */
trait TableLoader {
  def table(name: String): DataFrame

  /** The fact pair for an acquisition mode (`instance_field[_replay]`). */
  final def instanceField(mode: AcquisitionMode): DataFrame =
    table(s"instance_field${mode.suffix}")
  final def instanceMessage(mode: AcquisitionMode): DataFrame =
    table(s"instance_message${mode.suffix}")
}

/** The default backend: a directory of `<name>.parquet` files. */
final class ParquetLoader(spark: SparkSession, dir: String) extends TableLoader {
  override def table(name: String): DataFrame = Tables.load(spark, dir, name)
}

/** In-memory binding — synthesized fixtures and tests. */
final class MapLoader(tables: Map[String, DataFrame]) extends TableLoader {
  override def table(name: String): DataFrame = tables(name)
}

/** Generic DataSource binding — the reference's Cassandra-connector read
  * pattern (`Java/.../DataLoader.java:500-529`: one connector `format`
  * plus a per-table options map) behind the same seam. `options` maps a
  * table name to the connector's option set; nothing here depends on any
  * connector at compile time — the jar is deployment-provided, which is
  * the point of the seam. Connection coordinates (hosts, credentials)
  * belong in the session config, as the reference sets them, not here.
  */
final class DataSourceLoader(spark: SparkSession, format: String,
    options: String => Map[String, String]) extends TableLoader {
  override def table(name: String): DataFrame =
    spark.read.format(format).options(options(name)).load()
}

object DataSourceLoader {
  /** The reference's binding verbatim-in-shape: Cassandra connector format
    * with `{keyspace, table}` options per table (`DataLoader.java:500-505`,
    * `Scala/.../DatabaseLoad.scala:34-39`).
    */
  def cassandra(spark: SparkSession, keyspace: String): DataSourceLoader =
    new DataSourceLoader(spark, "org.apache.spark.sql.cassandra",
      name => Map("keyspace" -> keyspace, "table" -> name))
}
