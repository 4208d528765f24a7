package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Round-19 optimization harness: run selected SparkEntry queries N times
  * under the EXACT Bench session config (local[32], shuffle partitions 32,
  * AQE on) and print per-rep wall seconds plus the same Spark-accounting
  * decomposition Bench records (jobs/stages/tasks/run/gc/sched per rep).
  * Long enough runs let an external `jstack` sampler catch the hot frames.
  *
  * Usage: runMain graft.tools.ProfileR19 <sfDir> <reps> <query> [query...]
  */
object ProfileR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.debug.maxToStringFields", "10000")
      .config("spark.sql.maxPlanStringLength", "65536")
      .config(graft.GraftConf.localFsConf)
      .config(graft.GraftConf.shuffleConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    object acct extends org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicLong
      val stages = new java.util.concurrent.atomic.AtomicLong
      val tasks = new java.util.concurrent.atomic.AtomicLong
      val runMs = new java.util.concurrent.atomic.AtomicLong
      val gcMs = new java.util.concurrent.atomic.AtomicLong
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) { runMs.addAndGet(m.executorRunTime); gcMs.addAndGet(m.jvmGCTime) }
      }
      def snap(): Seq[Long] = Seq(jobs.get, stages.get, tasks.get, runMs.get, gcMs.get)
    }
    spark.sparkContext.addSparkListener(acct)

    def dropCaches(): Unit = {
      graft.CacheRegistry.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      graft.Checkpoints.releaseAll()
    }

    // In-JVM sampling profiler (SPARK_GRAFT_SAMPLE=1): every 50 ms,
    // aggregate the top interesting frame of each RUNNABLE executor task
    // thread. Printed as a histogram at exit — a poor man's async-profiler
    // for finding where streaming task CPU goes.
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sampling = sys.env.contains("SPARK_GRAFT_SAMPLE")
    if (sampling) {
      val t = new Thread(() => {
        while (true) {
          val all = Thread.getAllStackTraces
          all.forEach { (th, frames) =>
            // driver-side lens (r19 resume): the remaining wall on the
            // superstep queries is wall − Σrun/cores, i.e. DRIVER time —
            // sample the query-running main thread and the DAG scheduler
            // event loop too, tagged so the histogram separates the sides
            val nm = th.getName
            val driverSide = nm == "main" ||
              nm.startsWith("dag-scheduler-event-loop")
            if (th.getState == Thread.State.RUNNABLE && driverSide &&
                frames.nonEmpty) {
              val names = frames.map(f =>
                s"${f.getClassName}.${f.getMethodName}")
              val interesting = names.filterNot(n => n.startsWith("java.") ||
                n.startsWith("jdk.") || n.startsWith("scala.collection"))
                .take(6).mkString(" <- ")
              hist.merge(s"[$nm] $interesting", 1, (a, b) => a + b)
            }
            if (th.getState == Thread.State.RUNNABLE &&
                nm.startsWith("Executor task launch") &&
                frames.nonEmpty) {
              // for blocking/spawn tops, the CALLER is the story: skip
              // the jdk plumbing and show the first spark/scala frames
              val names = frames.map(f =>
                s"${f.getClassName}.${f.getMethodName}")
              val top = names.head
              val sig =
                if (top.contains("Thread.start0") || top.contains("Unsafe.park") ||
                    top.contains("forkAndExec") || top.contains("Object.wait"))
                  names.filterNot(n => n.startsWith("java.") ||
                      n.startsWith("jdk.") || n.startsWith("scala.concurrent"))
                    .take(7).mkString(" <- ")
                else names.take(5).mkString(" <- ")
              hist.merge(sig, 1, (a, b) => a + b)
            }
          }
          Thread.sleep(50)
        }
      })
      t.setDaemon(true)
      t.start()
    }

    // warm-up like Bench
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    // Interleaved A/B (SPARK_GRAFT_AB="key=value"): odd reps run with the
    // session conf SET, even reps with the session default — alternating
    // within one JVM, so a bursty-steal host window inflates both arms
    // instead of poisoning one (the r19 changelog-checkpointing A/B was
    // unreadable across separate JVMs minutes apart). Only valid for
    // confs read per query execution (AQE knobs, stream-start confs).
    val ab = sys.env.get("SPARK_GRAFT_AB").map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        val abTag = ab.map { case (k, v) =>
          if (rep % 2 == 1) { spark.conf.set(k, v); " ab=ON" }
          else { spark.conf.unset(k); " ab=off" }
        }.getOrElse("")
        val a0 = acct.snap()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        dropCaches()
        Thread.sleep(100) // let the listener bus drain
        val a1 = acct.snap()
        val d = a1.zip(a0).map { case (x, y) => x - y }
        println(f"[profile] $name rep=$rep rows=$n wall=$dt%.3f " +
          s"jobs=${d(0)} stages=${d(1)} tasks=${d(2)} run_ms=${d(3)} " +
          s"gc_ms=${d(4)}$abTag")
        graft.streaming.StreamMetrics.drain().foreach(l =>
          println(s"[profile]   $l"))
      }
    }
    if (sampling) {
      import scala.jdk.CollectionConverters._
      val top = hist.asScala.toSeq.sortBy(-_._2).take(40)
      val tot = hist.asScala.values.map(_.toInt).sum.max(1)
      println(s"[profile] === stack sample histogram ($tot samples) ===")
      top.foreach { case (sig, n) =>
        println(f"[profile] ${n.toInt * 100.0 / tot}%5.1f%% $sig")
      }
    }
    spark.stop()
  }
}
