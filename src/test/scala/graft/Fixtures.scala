package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Telemetry._

/** Deterministic telemetry fixtures covering the FIXTURES.md edge shapes:
  * changed/unchanged/never-updated fields, dotted JSON keys at degrees
  * 0/1/2, multi-update argmax, snapshot boundaries.
  *
  * Timeline: snapshots at instance 0 and 100; messages every instance,
  * log_time = 1000 * id; message type 100 between src 10 → dst 20, fields
  * 1–6.
  */
object Fixtures {

  val MsgType = 100
  val Src = 10
  val Dst = 20

  def uevolField(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (1 to 6).map(i =>
      UevolField(i, MsgType, s"f$i", s"field $i", i, 0, 4, "u", false, true, true))
      .toDF()
  }

  def instanceMessage(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0L to 200L).map(id =>
      InstanceMessage(id, MsgType, 1, Src, 2, Dst, id.toInt, 1000L * id, 1000L * id))
      .toDF()
  }

  /** Updates:
    *  f1: 50 (10→11), 120 (11→12)         — change in current epoch
    *  f2: 160 (20→21)                      — change AFTER target 150
    *  f6: 110 (60→61), 130 (61→62)        — multi-update argmax
    *  f6 path 000.001: 115 (7→8)          — per-path independence
    */
  def instanceField(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      InstanceField(1, MsgType, 50L, -1L, Src, Dst, "000", 0, 10L, 11L),
      InstanceField(1, MsgType, 120L, 50L, Src, Dst, "000", 0, 11L, 12L),
      InstanceField(2, MsgType, 160L, -1L, Src, Dst, "000", 0, 20L, 21L),
      InstanceField(6, MsgType, 110L, -1L, Src, Dst, "000", 0, 60L, 61L),
      InstanceField(6, MsgType, 130L, 110L, Src, Dst, "000", 0, 61L, 62L),
      InstanceField(6, MsgType, 115L, -1L, Src, Dst, "000.001", 0, 7L, 8L))
      .toDF()
  }

  def snapshotCatalog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(SnapshotRef("snap_0", 0L), SnapshotRef("snap_100", 100L)).toDF()
  }

  /** snap_0: state at instance 0; snap_100: state at 100 (f1 has absorbed
    * the update at 50). f3 = unchanged degree-1 dotted keys; f5 = degree-2
    * nested object; f4 absent everywhere (sentinel path).
    */
  def snapshots(spark: SparkSession): Map[String, DataFrame] = {
    import spark.implicits._
    val snap0 = Seq(
      SnapshotRow(1, Src, Dst, 0L, """{"000":10}"""),
      SnapshotRow(2, Src, Dst, 0L, """{"000":20}"""),
      SnapshotRow(3, Src, Dst, 0L, """{"000.001":1,"000.002":2}"""),
      SnapshotRow(5, Src, Dst, 0L, """{"000.001":{"000.001.001":5,"000.001.002":6}}"""),
      SnapshotRow(6, Src, Dst, 0L, """{"000":60,"000.001":7}"""))
    val snap100 = Seq(
      SnapshotRow(1, Src, Dst, 100L, """{"000":11}"""),
      SnapshotRow(2, Src, Dst, 100L, """{"000":20}"""),
      SnapshotRow(3, Src, Dst, 100L, """{"000.001":1,"000.002":2}"""),
      SnapshotRow(5, Src, Dst, 100L, """{"000.001":{"000.001.001":5,"000.001.002":6}}"""),
      SnapshotRow(6, Src, Dst, 100L, """{"000":61,"000.001":7}"""))
    Map("snap_0" -> snap0.toDF(), "snap_100" -> snap100.toDF())
  }

  /** Brute-force replay oracle: expected (field, path) -> (value, instanceId)
    * at `target`, from snapshot-at-epoch-start overlaid with updates ≤ target.
    */
  def replayExpected(target: Long): Map[(Int, String), (Double, Long)] = {
    val snapStart = if (target >= 100L) 100L else 0L
    val snapJson: Map[(Int, String), Double] =
      if (snapStart == 100L)
        Map((1, "000") -> 11.0, (2, "000") -> 20.0,
          (3, "000.001") -> 1.0, (3, "000.002") -> 2.0,
          (5, "000.001.001") -> 5.0, (5, "000.001.002") -> 6.0,
          (6, "000") -> 61.0, (6, "000.001") -> 7.0)
      else
        Map((1, "000") -> 10.0, (2, "000") -> 20.0,
          (3, "000.001") -> 1.0, (3, "000.002") -> 2.0,
          (5, "000.001.001") -> 5.0, (5, "000.001.002") -> 6.0,
          (6, "000") -> 60.0, (6, "000.001") -> 7.0)
    val updates = Seq(
      (1, "000", 50L, 11.0), (1, "000", 120L, 12.0), (2, "000", 160L, 21.0),
      (6, "000", 110L, 61.0), (6, "000", 130L, 62.0), (6, "000.001", 115L, 8.0))
      .filter { case (_, _, id, _) => id >= snapStart && id <= target }
    val latest = updates.groupBy(u => (u._1, u._2)).map { case (k, us) =>
      val best = us.maxBy(_._3)
      k -> (best._4, best._3)
    }
    val fromSnap = snapJson.map { case (k, v) => k -> (v, snapStart) }
    val merged = fromSnap ++ latest
    // f4 never updated, never snapshotted -> sentinel
    merged + ((4, "000") -> (-1.0, -1L))
  }
}
