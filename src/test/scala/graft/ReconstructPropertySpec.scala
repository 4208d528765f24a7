package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.model.Telemetry._
import graft.queries.MessageReconstruct

/** SURVEY.md §5.3 property test: for RANDOM delta logs with snapshots that
  * are consistent periodic dumps of the replayed state (how the reference
  * produces them), reconstruction at any target must equal brute-force
  * replay of every update ≤ target. Seeded generator — failures reproduce.
  */
class ReconstructPropertySpec extends SparkSpec {

  private val MsgType = 100
  private val Src = 10
  private val Dst = 20
  private val Fields = 1 to 5
  private val SnapStarts = Seq(0L, 100L)

  private case class Log(updates: Seq[(Int, Long, Long)]) { // (field, id, value)

    def replayState(at: Long): Map[Int, (Long, Long)] = // field -> (value, id)
      updates.filter(_._2 <= at).groupBy(_._1).map { case (f, us) =>
        val best = us.maxBy(_._2)
        f -> (best._3, best._2)
      }

    /** Expected PARITY-mode reconstruction between snapshots at s and e:
      * a key whose state is identical in both snapshots keeps the snapshot
      * value (the log is skipped — the reference's shortcut); everything
      * else follows the same update ≫ snap_min ≫ -1 lattice.
      */
    def parityExpected(target: Long, s: Long, e: Long): Map[(Int, String), (Double, Long)] = {
      val snapS = replayState(s)
      val snapE = replayState(e)
      val inEpoch = updates
        .filter(u => u._2 >= s && u._2 <= target)
        .groupBy(_._1).map { case (f, us) => val b = us.maxBy(_._2); f -> (b._3.toDouble, b._2) }
      Fields.map { f =>
        val same = snapS.contains(f) && snapE.contains(f) &&
          snapS(f)._1 == snapE(f)._1
        val v =
          if (same) (snapS(f)._1.toDouble, s)
          else inEpoch.get(f)
            .orElse(snapS.get(f).map { case (value, _) => (value.toDouble, s) })
            .getOrElse((-1.0, -1L))
        (f, "000") -> v
      }.toMap
    }

    /** Expected reconstruction at `target`: update-in-epoch ≫ snapshot ≫ -1. */
    def expected(target: Long): Map[(Int, String), (Double, Long)] = {
      val snapStart = SnapStarts.filter(_ <= target).max
      val snap = replayState(snapStart)
      val inEpoch = updates
        .filter(u => u._2 >= snapStart && u._2 <= target)
        .groupBy(_._1).map { case (f, us) => val b = us.maxBy(_._2); f -> (b._3.toDouble, b._2) }
      Fields.map { f =>
        val v = inEpoch.get(f)
          .orElse(snap.get(f).map { case (value, _) => (value.toDouble, snapStart) })
          .getOrElse((-1.0, -1L))
        (f, "000") -> v
      }.toMap
    }
  }

  private def genLog(seed: Long): Log = {
    val rnd = new Random(seed)
    val n = 5 + rnd.nextInt(25)
    val updates = (0 until n).map { _ =>
      (Fields(rnd.nextInt(Fields.size)), 1L + rnd.nextInt(200), rnd.nextInt(1000).toLong)
    }
    // one update per (field, id): duplicate ids for one field would make
    // "latest" ambiguous (the real log keys updates by instance id)
    Log(updates.groupBy(u => (u._1, u._2)).map(_._2.head).toSeq)
  }

  private def dfs(log: Log): (DataFrame, DataFrame, DataFrame, DataFrame, String => DataFrame) = {
    import spark.implicits._
    val instanceField = log.updates.map { case (f, id, v) =>
      InstanceField(f, MsgType, id, -1L, Src, Dst, "000", 0, 0L, v)
    }.toDF()
    val instanceMessage = (0L to 220L).map(id =>
      InstanceMessage(id, MsgType, 1, Src, 2, Dst, id.toInt, 1000L * id, 1000L * id)).toDF()
    val uevolField = Fields.map(i =>
      UevolField(i, MsgType, s"f$i", s"field $i", i, 0, 4, "u", false, true, true)).toDF()
    val catalog = SnapStarts.map(s => SnapshotRef(s"snap_$s", s)).toDF()
    val snapLoader = (name: String) => {
      val start = name.stripPrefix("snap_").toLong
      log.replayState(start).toSeq.map { case (f, (v, _)) =>
        SnapshotRow(f, Src, Dst, start, s"""{"000":$v}""")
      }.toDF()
    }
    (instanceField, instanceMessage, uevolField, catalog, snapLoader)
  }

  test("snapshot-diff parity equals the shortcut model on random logs (seeded)") {
    import spark.implicits._
    val (s, e) = (50L, 150L)
    for (seed <- 1L to 6L) {
      val log = genLog(seed)
      val (fi, im, uf, _, _) = dfs(log)
      val cat = Seq(SnapshotRef(s"snap_$s", s), SnapshotRef(s"snap_$e", e)).toDF()
      val loader = (name: String) => {
        val start = name.stripPrefix("snap_").toLong
        log.replayState(start).toSeq.map { case (f, (v, _)) =>
          SnapshotRow(f, Src, Dst, start, s"""{"000":$v}""")
        }.toDF()
      }
      for (target <- Seq(60L, 97L, 149L)) {
        val got = MessageReconstruct.getMessageSnapshotDiff(fi, im, uf, Some(cat), loader, target)
          .collect().map { r =>
            (r.getAs[Int]("uevol_field_id"), r.getAs[String]("relative_path")) ->
              (r.getAs[Double]("value"), r.getAs[Long]("instance_message_id"))
          }.toMap
        assert(got === log.parityExpected(target, s, e), s"seed=$seed target=$target")
      }
    }
  }

  test("reconstruction equals replay on random logs and targets (seeded)") {
    for (seed <- 1L to 6L) {
      val log = genLog(seed)
      val (fi, im, uf, cat, loader) = dfs(log)
      for (target <- Seq(7L, 100L, 183L)) {
        val got = MessageReconstruct.getMessage(fi, im, uf, Some(cat), loader, target)
          .collect().map { r =>
            (r.getAs[Int]("uevol_field_id"), r.getAs[String]("relative_path")) ->
              (r.getAs[Double]("value"), r.getAs[Long]("instance_message_id"))
          }.toMap
        assert(got === log.expected(target), s"seed=$seed target=$target")
      }
    }
  }
}
