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
}
