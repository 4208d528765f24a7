package graft

import org.apache.spark.sql.functions._

import graft.functions.GraphOps

/** Round-14 infrastructure: the StreamRunner update-mode changelog guard
  * and the GraftConf reliable-checkpoint path.
  */
class StreamRunnerGuardSpec extends SparkSpec {

  test("update-mode refuses a multi-batch changelog instead of double-counting") {
    import spark.implicits._
    val dir = graft.WorkDirs.acquire("test_graft_multibatch")
    // two files -> with maxFilesPerTrigger=1 the census for a key is
    // emitted once per batch; summing the memory table would double-count
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$dir/f1")
    Seq(("a", 3L), ("b", 4L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$dir/f2")
    val stream = spark.readStream
      .schema("k STRING, v BIGINT")
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
    val census = stream.groupBy("k").agg(sum("v").as("s"))
    val e = intercept[IllegalArgumentException] {
      streaming.StreamRunner.runToBatch(census, "guard_test", mode = "update")
    }
    assert(e.getMessage.contains("changelog"))
  }

  test("update-mode single-batch source still passes the guard") {
    import spark.implicits._
    val dir = graft.WorkDirs.acquire("test_graft_singlebatch")
    Seq(("a", 1L), ("a", 2L), ("b", 4L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    val stream = spark.readStream
      .schema("k STRING, v BIGINT").parquet(s"$dir/data")
    val census = stream.groupBy("k").agg(sum("v").as("s"))
    val got = streaming.StreamRunner
      .runToBatch(census, "guard_ok", mode = "update")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 4L))
  }
}

/** Reliable-checkpoint selection: with a checkpoint dir set, every
  * superstep materialization writes real checkpoint files (survives
  * executor loss on a cluster); without one, localCheckpoint. The spec
  * flips the session's global checkpoint dir and restores it afterwards
  * so later suites keep the local-mode default.
  */
class GraftConfSpec extends SparkSpec {

  private def resetCheckpointDir(): Unit = {
    // SparkContext has no public unset; restore the local-mode default
    // via the private field so the shared session's later suites are
    // unaffected
    val f = spark.sparkContext.getClass.getDeclaredField("checkpointDir")
    f.setAccessible(true)
    f.set(spark.sparkContext, None)
  }

  test("Checkpoints.eager takes the reliable path when a dir is set") {
    import spark.implicits._
    assert(!GraftConf.reliableCheckpointsEnabled(spark))
    val dir = graft.WorkDirs.acquire("test_graft_ckpt")
    try {
      GraftConf.enableReliableCheckpoints(spark, dir.toString)
      assert(GraftConf.reliableCheckpointsEnabled(spark))
      val out = Checkpoints.eager(
        Seq((1L, 2L), (3L, 4L)).toDF("a", "b"))
      assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        Set((1L, 2L), (3L, 4L)))
      // real checkpoint files landed under the dir
      def anyFile(p: java.io.File): Boolean =
        p.isFile || Option(p.listFiles).exists(_.exists(anyFile))
      assert(anyFile(dir), "no reliable checkpoint files written")
    } finally resetCheckpointDir()
    assert(!GraftConf.reliableCheckpointsEnabled(spark))
  }

  test("graph supersteps are identical under the reliable path") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 1L), (7L, 8L), (8L, 7L))
    val local = GraphOps.labelPropagationConverged(
        edges.toDF("src", "dst"), "src", "dst", maxRounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = graft.WorkDirs.acquire("test_graft_ckpt_lpa")
    val reliable = try {
      GraftConf.enableReliableCheckpoints(spark, dir.toString)
      GraphOps.labelPropagationConverged(
          edges.toDF("src", "dst"), "src", "dst", maxRounds = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally resetCheckpointDir()
    assert(reliable === local)
  }

  test("builderConf carries the checkpoint-file cleaner flag") {
    assert(GraftConf.builderConf(
      "spark.cleaner.referenceTracking.cleanCheckpoints") === "true")
  }
}
