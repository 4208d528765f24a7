package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Runs a streaming frame over a FINITE source to completion and hands the
  * result back as a batch frame — the bridge that lets the driver's batch
  * oracle gate a genuinely streaming plan (real `readStream` file source,
  * real state store, append mode).
  *
  * The memory sink holds only the stream's OUTPUT rows (the bounded result
  * the oracle compares — sessions, surviving fingerprints), never the
  * corpus, so this is not a collect-over-data: the heavy work happens in
  * the streaming DAG's executors exactly as a parquet/Kafka sink run
  * would. Production deployments replace the sink, nothing else.
  */
object StreamRunner {

  // memory-sink names are session-global; a fresh one per invocation keeps
  // bench reruns (4x per query in one JVM) from appending into each other
  private val n = new AtomicLong(0)

  /** `mode`: "append" for stateless/final-emit streams; "update" for
    * changelog aggregations — with a finite source arriving as one
    * micro-batch, update mode emits each key exactly once (the final
    * state), which is what makes an update-mode aggregation
    * oracle-comparable here. That single-batch premise is ENFORCED, not
    * assumed: with several data micro-batches (multi-file source,
    * maxFilesPerTrigger) update mode re-emits changed keys per batch and
    * the memory table would hold a changelog, silently double-counting
    * any downstream sum — so such a run fails loudly instead. (Append
    * mode rows are final by definition and need no guard.)
    */
  /** `noDataBatches = false` skips the trailing no-data micro-batch
    * (`spark.sql.streaming.noDataMicroBatches.enabled`). Safe ONLY for
    * sinks whose every row is emitted in the data batch itself — inner
    * stream-stream joins and stateless maps, where the no-data batch
    * exists purely to advance the watermark and evict state (~2.2 s of
    * q45's 5.1 s row was this lifecycle batch). NOT safe for aggregations
    * or outer joins that emit on watermark passage — their finalized rows
    * would never appear. The conf is session-global, so it is set for the
    * run and restored after (queries run sequentially in Verify/Bench).
    */
  def runToBatch(stream: DataFrame, prefix: String,
                 mode: String = "append",
                 noDataBatches: Boolean = true): DataFrame = {
    val spark = stream.sparkSession
    val name = s"${prefix}_run${n.incrementAndGet()}"
    val confKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevConf = spark.conf.getOption(confKey)
    if (!noDataBatches) spark.conf.set(confKey, "false")
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try {
      q.processAllAvailable()
      if (mode == "update") {
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches <= 1,
          s"$name: update-mode memory sink saw $dataBatches data " +
            "micro-batches; its rows form a changelog, not final state - " +
            "fold to the last emission per key before consuming, or run " +
            "the finite source as a single batch")
      }
    } finally {
      // Micro-batch accounting (SPARK_GRAFT_STREAM_METRICS=1): one stderr
      // line per progress event — batch id, input rows, trigger wall time,
      // state rows — so a bench exceedance on a streaming row can be
      // decomposed into batches×cost instead of guessed at. stderr keeps
      // the Bench stdout contract line clean.
      if (sys.env.contains("SPARK_GRAFT_STREAM_METRICS")) {
        // recentProgress retains only the last N batches (default 100):
        // mark truncation explicitly so a batches×cost reconciliation
        // can't silently miss the early (often cold) batches.
        q.recentProgress.headOption.filter(_.batchId > 0).foreach(p =>
          System.err.println(s"[stream-metrics] $name TRUNCATED: first " +
            s"retained batch=${p.batchId} (raise " +
            "spark.sql.streaming.numRecentProgressUpdates for full capture)"))
        q.recentProgress.foreach { p =>
          val state = p.stateOperators.map(s =>
            s"${s.operatorName}:rows=${s.numRowsTotal},updated=${s.numRowsUpdated}")
            .mkString(";")
          val trig = Option(p.durationMs.get("triggerExecution"))
            .map(_.toString).getOrElse("-")
          System.err.println(
            s"[stream-metrics] $name batch=${p.batchId} rows=${p.numInputRows} " +
              s"triggerMs=$trig state=$state")
        }
      }
      q.stop()
      if (!noDataBatches) prevConf match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
    spark.table(name)
  }
}
