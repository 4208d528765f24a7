package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dump-over-dump churn report — the curator's question when a new crawl
  * lands: what was added, what disappeared, what changed in place? The
  * reference has no analog (its tables are append-only telemetry); this is
  * the corpus-versioning capability a recurring 100 TB ingest needs before
  * deciding how much downstream work (dedup, decontam, re-packing) to
  * re-run.
  *
  * Scale shape: both sides reduce map-side to (id, fingerprint) — the join
  * carries two narrow columns, never document text — then ONE id-keyed
  * full-outer sort-merge join and a codegen'd status projection. No
  * broadcast assumption (both dumps are corpus-sized); AQE picks the join
  * strategy. [[summary]] adds one partial-agg exchange over the 4-row
  * status domain.
  */
object CorpusDiff {

  /** Per-document status between two dumps sharing an id space:
    * `added` (id only in `cur`), `removed` (only in `old`), `changed`
    * (both sides, fingerprints differ), `unchanged`. Fingerprint =
    * [[TextAnalysis.fingerprintHex]] (md5 of the lowercased text) — swap
    * a stricter hash in by passing a different `fp`.
    */
  def diff(old: DataFrame, cur: DataFrame, idCol: String, textCol: String,
           fp: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
             TextAnalysis.fingerprintHex): DataFrame = {
    val o = old.select(col(idCol).as("__id"), fp(col(textCol)).as("__fp_old"))
    val n = cur.select(col(idCol).as("__id"), fp(col(textCol)).as("__fp_new"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "removed")
          .when(col("__fp_old") === col("__fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** The 4-row rollup of [[diff]]: (status, n_docs). */
  def summary(old: DataFrame, cur: DataFrame, idCol: String,
              textCol: String): DataFrame =
    diff(old, cur, idCol, textCol)
      .groupBy("status").agg(count(lit(1)).as("n_docs"))

  /** CONTENT-level novelty of a new dump against the previous one —
    * [[diff]]'s id-keyed churn cannot see re-keyed or remixed text; this
    * measures it: per new-dump doc, the share of its distinct n-grams
    * never seen anywhere in the old dump. 1.0 = genuinely new writing,
    * 0.0 = pure recombination of old content — the signal deciding
    * whether a re-crawl is worth its processing budget.
    *
    * Shape is d35's asymmetric probe: the old dump reduces to its
    * DISTINCT gram-hash set (one partial agg — the unavoidable pass that
    * reads it once), the new dump's per-doc distinct grams take ONE
    * left-semi against it (old-side frequency skew cannot multiply the
    * join), and a per-doc ratio closes. Returns (idCol, n_grams, n_new,
    * novelty) for new-dump docs with ≥n words.
    */
  def gramNovelty(old: DataFrame, cur: DataFrame, idCol: String,
                  textCol: String, n: Int = 3): DataFrame = {
    require(n > 0, s"n=$n must be positive")
    def grams(d: DataFrame) = d
      .select(col(idCol), split(lower(col(textCol)), " ").as("__w"))
      .where(size(col("__w")) >= n)
      .select(col(idCol), explode_outer(graft.plans.TextExpressions
        .shinglesColumn(d.sparkSession, col("__w"), n)).as("sh"))
      .distinct()
    val oldSet = grams(old).select("sh").distinct()
    val curGrams = graft.CacheRegistry.track(
      grams(cur).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val seen = curGrams.join(oldSet, Seq("sh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("__n_seen"))
    curGrams.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
      .join(seen, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        (col("n_grams") - coalesce(col("__n_seen"), lit(0L))).as("n_new"),
        round((col("n_grams") - coalesce(col("__n_seen"), lit(0L)))
          .cast("double") / col("n_grams"), 6).as("novelty"))
  }
}
