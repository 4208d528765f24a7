package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 adjudication harness for d120_ivf_trained_recall — the one
  * repeat bench flag (r14 3.80x, r15 10.11x with all four samples slow)
  * whose in-plan audit found nothing. Decomposes the query into its
  * phases under EXACT Bench conditions and prints, per phase, the bench
  * statistic (min over cold+3 warm) plus Spark job counts and summed
  * scheduler delay — so "many tiny driver-synchronized jobs stall under
  * host load" separates from "some phase is slow, period".
  *
  * Phases:
  *   scan        embeddings parquet scan + count
  *   train       VectorIVF.train(k=8, iters=2) — norm persist, seed
  *               collect, 2 Lloyd collects: the driver-synchronized
  *               many-small-jobs part (runs eagerly inside the call)
  *   bench       the full d120 under the bench count() statistic — the
  *               recall joins are PRUNED by count (BASELINE.md d94/d96
  *               note), so this ≈ train + a corpus scan
  *   unpruned    the full d120 materialized via a noop write — the
  *               Verify-shaped plan with the approx/exact join branches
  *               LIVE; the honest upper floor if pruning ever breaks
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileD120
  */
object ProfileD120 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.debug.maxToStringFields", "10000")
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    object acct extends org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicLong
      val schedMs = new java.util.concurrent.atomic.AtomicLong
      val runMs = new java.util.concurrent.atomic.AtomicLong
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val info = t.taskInfo
        val m = t.taskMetrics
        if (info != null && m != null) {
          runMs.addAndGet(m.executorRunTime)
          // subtract the indirect result-fetch duration too (Bench's
          // formula): gettingResultTime is a start timestamp, 0 = none
          val fetchMs =
            if (info.gettingResultTime > 0)
              info.finishTime - info.gettingResultTime
            else 0L
          schedMs.addAndGet(math.max(0L, info.duration - m.executorRunTime -
            m.executorDeserializeTime - m.resultSerializationTime - fetchMs))
        }
      }
    }
    spark.sparkContext.addSparkListener(acct)
    def busDrain(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(50) }

    def dropCaches(): Unit = {
      graft.CacheRegistry.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      graft.Checkpoints.releaseAll()
    }
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    def phase(name: String)(f: => Unit): Unit = {
      val samples = (1 to 4).map { _ =>
        busDrain()
        val j0 = acct.jobs.get; val s0 = acct.schedMs.get
        val r0 = acct.runMs.get
        val t0 = System.nanoTime()
        f
        val sec = (System.nanoTime() - t0) / 1e9
        busDrain()
        dropCaches()
        (sec, acct.jobs.get - j0, acct.schedMs.get - s0, acct.runMs.get - r0)
      }
      val best = samples.minBy(_._1)
      println(f"PHASE $name%-10s min=${best._1}%7.3f s  " +
        f"jobs=${best._2}%3d  sched_ms=${best._3}%6d  run_ms=${best._4}%7d  " +
        s"all=${samples.map(s => f"${s._1}%.3f").mkString("[", ",", "]")}")
    }

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    phase("scan") { e.count(): Unit }
    phase("train") {
      graft.functions.VectorIVF.train(e, "vec_id", "embedding",
        k = 8, iters = 2).count(): Unit
    }
    phase("bench") {
      graft.SparkEntry.queries("d120_ivf_trained_recall")(spark, sfDir)
        .count(): Unit
    }
    phase("unpruned") {
      graft.SparkEntry.queries("d120_ivf_trained_recall")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
