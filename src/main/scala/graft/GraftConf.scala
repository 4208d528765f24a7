package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cluster-deployment configuration for the iterative operators.
  *
  * The graph/clustering fixpoints ([[functions.GraphOps]],
  * [[functions.MinHashLSH.clusters]]) truncate lineage each superstep.
  * Without a checkpoint directory they fall back to `localCheckpoint`,
  * whose truncated lineage roots in partitions held by the executors'
  * block managers — on a REAL cluster a lost executor then fails the job
  * instead of recomputing (single-JVM local mode cannot lose one, which
  * is why the fallback exists at all). This object turns that scaladoc
  * warning into enforced configuration: apply it once at session setup
  * and every superstep materialization in the library selects the
  * reliable-checkpoint path automatically.
  */
object GraftConf {

  /** Settings that must be present BEFORE the SparkContext exists —
    * pass to `SparkSession.builder().config(...)` (or spark-submit
    * --conf). `cleanCheckpoints` makes superseded reliable checkpoint
    * files eligible for deletion when their RDD is GC'd; without it a
    * long-running driver accumulates one file set per superstep for the
    * app's lifetime.
    */
  val builderConf: Map[String, String] = Map(
    "spark.cleaner.referenceTracking.cleanCheckpoints" -> "true")

  /** Point the session at a reliable (HDFS/S3/shared-FS) checkpoint
    * directory. After this, [[Checkpoints.eager]] — the materialization
    * seam every iterative operator goes through — writes real checkpoint
    * files instead of localCheckpoint blocks.
    */
  def enableReliableCheckpoints(spark: SparkSession, dir: String): Unit =
    spark.sparkContext.setCheckpointDir(dir)

  /** True when the session will take the reliable path. */
  def reliableCheckpointsEnabled(spark: SparkSession): Boolean =
    spark.sparkContext.getCheckpointDir.isDefined
}

/** The one materialization seam for per-superstep lineage truncation. */
object Checkpoints {

  /** Eagerly materialize `df` with truncated lineage: a reliable
    * `checkpoint` when the session has a checkpoint dir (cluster
    * deployments — survives executor loss and unpersist), a
    * `localCheckpoint` otherwise (single-JVM local mode, where block
    * loss cannot happen).
    *
    * The reliable path persists the physical RDD BEFORE materializing:
    * `RDD.checkpoint` writes its files in a SEPARATE job after the first
    * action, which would otherwise re-run the superstep's whole plan a
    * second time — the cached blocks feed the write job, then free (the
    * [[functions.MinHashLSH.clustersStar]] pattern, shared here so every
    * iterative operator gets it instead of re-deriving it).
    */
  def eager(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.sparkContext.getCheckpointDir.isDefined) {
      val rdd = df.rdd
      rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.checkpoint()
      rdd.count() // one job computes + feeds the checkpoint write
      rdd.unpersist(false)
      spark.createDataFrame(rdd, df.schema)
    } else df.localCheckpoint(true)
  }
}
