package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based document scoring seam — the classifier-filter stage of a
  * modern pretraining pipeline (FineWeb-Edu's educational-quality
  * classifier, LLM-as-judge quality labels, reward-model filtering):
  * every document gets a score from a MODEL, and the corpus is filtered
  * or curriculum-bucketed on it.
  *
  * The container ships no inference runtime, so the bundled scorer is a
  * clearly-marked deterministic stand-in ([[HashScorer]] — md5-derived,
  * which makes the seam itself oracle-checkable end-to-end, d97). The
  * Spark-side plumbing is the real contract, mirroring
  * [[Multimodal.MediaCodec]]:
  *
  *  - one scorer instance per partition (`open()` once — where a real
  *    binding loads weights / opens a session), released on TASK end
  *    (not iterator exhaustion — limits/failures must not leak a native
  *    context);
  *  - texts flow through `scoreBatch` in micro-batches of `batchSize` —
  *    the amortization every real inference engine needs — with a hard
  *    alignment check (a scorer returning the wrong count fails loudly,
  *    never silently mis-assigns scores);
  *  - batch boundaries are invisible in the output: (id, score) rows
  *    align row-for-row regardless of partitioning or batch size;
  *  - NULL text is never sent to the scorer and scores NULL ("unscored"
  *    — the [[Sampling.percentileCalibrate]] convention, so an unscored
  *    doc can't silently pass or fail a threshold).
  *
  * Map-only: the text column never crosses an exchange for scoring.
  */
object ModelScore {

  /** Pluggable batch scorer. Implementations must be Serializable; one
    * instance ships per task and is reused across the partition.
    */
  trait TextScorer extends Serializable {
    /** Per-partition init hook (load weights, open a session). */
    def open(): Unit = ()
    /** Scores for a batch, aligned index-for-index with `texts`. */
    def scoreBatch(texts: Array[String]): Array[Double]
    /** Per-partition teardown hook. */
    def close(): Unit = ()
  }

  /** Deterministic stand-in: `round(md5(text)[0:8] / 2^32, 6)` ∈ [0, 1) —
    * uniform, engine-replayable (the d97 oracle recomputes it in SQL), and
    * honest about being content-derived rather than quality-derived.
    */
  object HashScorer extends TextScorer {
    override def scoreBatch(texts: Array[String]): Array[Double] =
      texts.map { t =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hx = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val u = java.lang.Long.parseLong(hx.substring(0, 8), 16) / 4294967296.0
        java.math.BigDecimal.valueOf(u)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      }
  }

  /** `df(idCol, textCol)` → (idCol, model_score): batched scoring through
    * the seam. Scores are NULL for NULL text. The id column keeps its
    * ORIGINAL type (string URLs, hashes, longs — whatever the corpus
    * keys by; sibling APIs like [[CorpusCatalog]] accept the same), and
    * a NULL id passes through like any other row.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            scorer: TextScorer = HashScorer, batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, s"batchSize=$batchSize must be positive")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val in = df.select(col(idCol), col(textCol))
    val outSchema = StructType(Seq(in.schema.head,
      StructField("model_score", DoubleType, nullable = true)))
    in.mapPartitions { it =>
      scorer.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => scorer.close()))
      it.grouped(batchSize).flatMap { batch =>
        val (scored, unscored) = batch.zipWithIndex
          .partition { case (r, _) => !r.isNullAt(1) }
        val scores = scorer.scoreBatch(scored.map(_._1.getString(1)).toArray)
        require(scores.length == scored.length,
          s"scorer returned ${scores.length} scores for ${scored.length} texts")
        val out = new Array[Row](batch.length)
        scored.zip(scores).foreach { case ((r, i), s) =>
          out(i) = Row(r.get(0), s)
        }
        unscored.foreach { case (r, i) => out(i) = Row(r.get(0), null) }
        out.iterator
      }
    }(Encoders.row(outSchema))
  }
}
