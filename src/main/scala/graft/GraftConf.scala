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

  /** `file:` scheme served by [[graft.io.NioLocalFileSystem]] — the
    * shell-fork-free local filesystem (r19 optimization; see that class's
    * scaladoc for the measurements). Apply wherever the session touches
    * local scratch (checkpoints, WorkDirs fixtures, catalog artifacts) on
    * a JVM without the Hadoop native library; deployments whose `file:`
    * access is negligible (HDFS/S3 checkpoints) can skip it — results
    * are identical either way.
    */
  val localFsConf: Map[String, String] = Map(
    "spark.hadoop.fs.file.impl" -> "graft.io.NioLocalFileSystem",
    "spark.hadoop.fs.AbstractFileSystem.file.impl" -> "graft.io.NioLocalFs")

  /** Shuffle-writer settings for the iterative/superstep-heavy workload
    * (r19 optimization, guide §2.2 "fewer, larger blocks" applied to the
    * small-shuffle regime). Stack-sampling the graph/containment rows
    * showed ~36% of their executor CPU in the BYPASS shuffle writer's
    * file machinery: with R reducers each map task opens R partition
    * files (`DiskBlockObjectWriter.open` 14%), probes temp-block names
    * (`File.exists` 6%), then mmaps/concatenates them into one output
    * (`FileChannel.map/unmap` 12%) plus a checksum sidecar per map task.
    * A superstep query runs 40-80 tiny shuffles, so this O(M·R) file
    * cost dominates its actual aggregation work.
    *
    * - `bypassMergeThreshold = 0` forces the serialized sort writer
    *   (ONE spill file + index per map task, no per-partition files, no
    *   concat). Production-scale jobs with R > 200 take that path
    *   ALREADY (the bypass writer is only chosen when
    *   R <= bypassMergeThreshold, default 200), so this aligns the
    *   small-R local regime with the at-scale code path rather than
    *   tuning for local mode. Measured on the seven hottest iterative
    *   rows: 15-35% wall reduction each (d149 6.5→4.8, d152 7.5→5.3,
    *   q31 4.2→3.5, d156 3.0→1.9 s).
    * - `checksum.enabled = false` drops the per-map-task shuffle
    *   checksum sidecar file — a fetch-corruption DIAGNOSTIC (Spark
    *   3.2+, used to classify corruption on fetch retry), not an
    *   integrity gate on results; with it off results are identical and
    *   each tiny shuffle saves one file create+write+rename. Measured
    *   on top of the writer change: d149 4.8→3.4, d152 5.3→4.1,
    *   q31 3.5→2.8, d146 7.2→5.4 s. Deployments debugging flaky disks
    *   should re-enable it.
    */
  val shuffleConf: Map[String, String] = Map(
    "spark.shuffle.sort.bypassMergeThreshold" -> "0",
    "spark.shuffle.checksum.enabled" -> "false")

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

  private val StateProviderKey =
    "spark.sql.streaming.stateStore.providerClass"
  private val RocksDbProvider = "org.apache.spark.sql.execution." +
    "streaming.state.RocksDBStateStoreProvider"

  /** Select the RocksDB state store for streaming queries whose state is
    * CENSUS- rather than O(1)-sized — the heavy-hitter vocabulary census
    * (d166) or a windowed sketch under a very long watermark horizon
    * (d168). The default HDFS-backed provider holds every state row in
    * executor-heap hash maps, so a vocabulary that outgrows the heap is
    * an OOM; RocksDB keeps state in native memory + local disk and
    * degrades to spill instead. Results are IDENTICAL — the provider
    * changes where state lives, never what it holds (spec-pinned in
    * `StreamingSpec`). Read at STREAM START: set it before `start()`,
    * and existing checkpointed streams must not switch providers
    * mid-checkpoint (Spark refuses the mixed checkpoint loudly).
    */
  // the provider each session ran before enableRocksDbStateStore, so
  // disable RESTORES rather than clobbers a custom provider (the
  // StreamRunner prevConf discipline). WEAK keys: a session that enables
  // but never disables must not be pinned for the JVM lifetime by this
  // registry (the entry dies with the session, and its stale prior value
  // is meaningless once the session is unreachable anyway). WeakHashMap
  // is not thread-safe, so all access goes through its own lock.
  private val priorProvider =
    new java.util.WeakHashMap[SparkSession, Option[String]]()

  def enableRocksDbStateStore(spark: SparkSession): Unit = {
    priorProvider.synchronized {
      if (!priorProvider.containsKey(spark))
        priorProvider.put(spark, spark.conf.getOption(StateProviderKey))
    }
    spark.conf.set(StateProviderKey, RocksDbProvider)
  }

  /** True when streaming queries started now will keep state in RocksDB. */
  def rocksDbStateStoreEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption(StateProviderKey).contains(RocksDbProvider)

  /** Restore the provider that was configured before
    * [[enableRocksDbStateStore]] (the session default if none was) for
    * streams started after this call — a session running a custom
    * third-party provider gets it back, not the HDFS default.
    */
  def disableRocksDbStateStore(spark: SparkSession): Unit =
    priorProvider.synchronized {
      Option(priorProvider.remove(spark))
    }.flatten match {
      case Some(prev) => spark.conf.set(StateProviderKey, prev)
      case None => spark.conf.unset(StateProviderKey)
    }
}

/** The one materialization seam for per-superstep lineage truncation. */
object Checkpoints {

  // Block-holding RDDs behind localCheckpoint'd frames. localCheckpoint
  // blocks are freed neither by Dataset.unpersist (they are not a SQL
  // cache entry) nor by CacheRegistry/CacheManager — absent this registry
  // they die only when the ContextCleaner notices the RDD object was
  // GC'd, which on a large-heap driver can be tens of minutes after the
  // frame is dead (spark.cleaner.periodicGC.interval defaults to 30 min).
  // Round 14's bench measured exactly that: graph queries alphabetically
  // early in the run parked GB of dead superstep blocks in the block
  // manager, and the mid-run d38-d57 window paid for them in storage
  // eviction churn. Tracking here makes the blocks explicitly releasable.
  private val localFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  // A/B instrumentation ONLY (BASELINE.md round-15 adjudication): with
  // SPARK_GRAFT_NO_EAGER_RELEASE=1 both release paths no-op, emulating
  // the pre-round-15 lifetime where dead superstep blocks survive until
  // a JVM GC lets the ContextCleaner reap them — so one binary can
  // measure the block-accumulation mechanism and its fix side by side.
  private val releaseDisabled = sys.env.contains("SPARK_GRAFT_NO_EAGER_RELEASE")

  /** The block-holding RDD behind a frame produced by [[eager]]'s
    * localCheckpoint path: its analyzed plan is a `LogicalRDD` whose
    * `rdd` field is the persisted internal-row RDD. Accessed
    * reflectively — `LogicalRDD` lives in `org.apache.spark.sql.execution`
    * and is not API — with a None fallback (tracking is then skipped and
    * behavior degrades to pre-round-15 GC-driven release, never an error).
    */
  private def blockRdd(cp: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    try {
      val plan = cp.queryExecution.analyzed
      if (plan.getClass.getSimpleName == "LogicalRDD")
        Some(plan.getClass.getMethod("rdd").invoke(plan)
          .asInstanceOf[org.apache.spark.rdd.RDD[_]])
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

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
    *
    * Local-path frames are tracked: release one explicitly with
    * [[release]] (iterative operators call it on the superseded superstep
    * as soon as the next one materializes, bounding live blocks per query
    * to ~2 supersteps), and drain the rest with [[releaseAll]] once the
    * query's result is consumed (Bench does, between queries).
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
    } else {
      val cp = df.localCheckpoint(true)
      // under the A/B disable flag, tracking must be skipped too: a
      // tracked-but-never-released RDD is a strong reference that blocks
      // the ContextCleaner's GC-driven reaping for the JVM lifetime,
      // which would make the "disabled" arm strictly WORSE than the
      // pre-round-15 behavior it exists to emulate
      if (!releaseDisabled) blockRdd(cp).foreach(localFrames.add)
      cp
    }
  }

  /** Free the blocks behind a frame [[eager]] produced, now — not at the
    * next JVM GC. ONLY for frames that are fully dead: a released frame
    * (and anything lazily derived from it) fails on its next action,
    * because the truncated lineage cannot recompute. The iterative loops
    * call this on superstep t once superstep t+1 has materialized; t+1's
    * plan roots in its OWN blocks, so t is unreferenced by construction.
    * No-op for reliable-checkpoint frames (their blocks were already
    * dropped in [[eager]]; files are governed by the ContextCleaner under
    * [[GraftConf.builderConf]]'s cleanCheckpoints).
    */
  def release(cp: DataFrame): Unit =
    if (!releaseDisabled) blockRdd(cp).foreach { r =>
      localFrames.remove(r)
      try r.unpersist(true)
      catch { case scala.util.control.NonFatal(_) => () }
    }

  /** Unpersist every tracked localCheckpoint RDD and empty the registry.
    * Call once per query AFTER its result is fully consumed (the
    * [[CacheRegistry.releaseAll]] contract — and the same caveat: not
    * safe while a graft query is mid-execution). Blocking, for the same
    * reason CacheRegistry's release is.
    */
  def releaseAll(): Unit = if (!releaseDisabled) {
    var r = localFrames.poll()
    while (r != null) {
      try r.unpersist(true)
      catch { case scala.util.control.NonFatal(_) => () }
      r = localFrames.poll()
    }
  }

  /** Number of currently tracked local-checkpoint RDDs (for specs and
    * the Bench storage accounting). */
  def trackedCount: Int = localFrames.size()
}
