package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard set-similarity self-join via prefix filtering —
  * the AllPairs/PPJoin family (Bayardo et al., WWW'07; Xiao et al.,
  * WWW'08), the exact counterpart to [[MinHashLSH]]'s approximate banding.
  *
  * Guarantee: returns EVERY pair with shingle-set Jaccard ≥ `threshold`
  * (no false negatives, unlike LSH banding) with the exact similarity
  * attached, yet never forms the all-pairs product.
  *
  * How it scales: under any global total order over shingles, a pair with
  * J(a,b) ≥ t must share a shingle within the first
  * |x| − ⌈t·|x|⌉ + 1 shingles of BOTH docs (the prefix-filtering lemma:
  * J ≥ t ⟹ |a∩b| ≥ t·max(|a|,|b|), and skipping a full prefix leaves a
  * suffix too short to hold that intersection). So candidates come from an
  * EQUIJOIN on prefix shingles only — at t = 0.8 that is 20% of each doc —
  * and the exact Jaccard verify runs on candidates alone. With the
  * rarest-first global order (ascending document frequency) the join keys
  * are skew-free by construction: frequent shingles land in suffixes and
  * never become join keys, which is what keeps bucket sizes bounded on a
  * power-law vocabulary at corpus scale.
  *
  * Candidates are pruned twice more before the verify, both classic:
  * the length filter (J ≥ t ⟹ t·|a| ≤ |b| ≤ |a|/t) and PPJoin's
  * positional filter — for the FIRST shared prefix shingle, at global-order
  * ranks (ra, rb), no common shingle can precede it in either doc, so
  * |a∩b| ≤ 1 + min(|a|−ra, |b|−rb); pairs whose bound misses the required
  * overlap ⌈t/(1+t)·(|a|+|b|)⌉ never reach the verify join.
  *
  * Shuffle inventory (all equijoins/aggs, nothing quadratic): document
  * frequency agg + freq join + per-doc rank window (the rarest-first
  * order), candidate equijoin on prefix shingles, two id-joins for the
  * verify. `freqOrder = false` drops the first three — the global order
  * becomes the hash value itself, map-only prefix emission — for corpora
  * where the vocabulary is known to be flat.
  */
object JaccardJoin {

  /** ⌈x⌉ with a one-sided guard against float ulp inflation: the exact
    * product t·|x| can land on an integer the double rounds a hair above
    * (0.7 × 30 = 21.000000000000004), and a plain ceil would then demand
    * one element too many — a silent false NEGATIVE. The epsilon only ever
    * admits an extra candidate (false positives are fine: the exact verify
    * decides), never drops one.
    */
  private def safeCeil(x: Column): Column = ceil(x - 1e-6)

  /** All pairs (doc_a < doc_b) with n-gram Jaccard ≥ `threshold`, as
    * (doc_a, doc_b, jaccard) with jaccard rounded to 1e-6 (the grid the
    * [[MinHashLSH.jaccard]] verify uses). Shingles are the same 60-bit
    * md5-hashed n-word grams as the MinHash pipeline, so the two operators
    * agree on what "the shingle set" is.
    *
    * Caching note: the shingle and prefix frames are persisted for the
    * lifetime of the returned plan (each is read by ≥2 subplans). A
    * long-running driver issuing many joins should release them
    * (`spark.catalog.clearCache()` or unpersist via the cache manager)
    * once results are consumed — same contract as
    * [[graft.queries.MessageReconstruct.getMessageSnapshotDiff]] and
    * [[TextAnalysis.tfidfTopK]].
    */
  def similarPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, n: Int = 3,
                   freqOrder: Boolean = true): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold=$threshold out of (0,1]")
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Reused ≥2×: prefix emission + both sides of the verify (S4 rule).
    val sh = MinHashLSH.shingleArrays(df, idCol, textCol, n).persist(disk)

    // Prefix rows (id, sz, sh, r): r is the shingle's 1-based rank under
    // the global order, kept for the positional filter; prefix length
    // p(x) = |x| − ⌈t·|x|⌉ + 1. Persisted (S4 rule): BOTH sides of the
    // candidate self-join read it, and in the freq-order path the df agg +
    // freq join + rank window behind it would otherwise run once per side.
    val prefix = (
      if (freqOrder) {
        val toks = sh.select(col(idCol), size(col("sh_arr")).as("sz"),
          explode(col("sh_arr")).as("sh"))
        val freq = toks.groupBy("sh").agg(count(lit(1)).as("df"))
        toks.join(freq, "sh")
          .withColumn("r", row_number().over(
            Window.partitionBy(col(idCol)).orderBy(col("df"), col("sh"))))
          .where(col("r") <= col("sz") - safeCeil(col("sz") * threshold) + 1)
          .select(col(idCol), col("sz"), col("sh"), col("r"))
      } else {
        val sz = size(col("sh_arr"))
        val p = (sz - safeCeil(sz * threshold) + 1).cast("int")
        sh.select(col(idCol), sz.as("sz"),
            posexplode(slice(sort_array(col("sh_arr")), lit(1), p)))
          .select(col(idCol), col("sz"), col("col").as("sh"),
            (col("pos") + 1).as("r"))
      }).persist(disk)

    // Candidate equijoin on shared prefix shingles. Length filter before
    // the aggregation; min(ra)/min(rb) land on the SAME row (ranks are
    // consistent with one global order), giving the first shared shingle
    // for the positional filter.
    val cand = prefix.select(col(idCol).as("doc_a"), col("sz").as("sz_a"),
        col("sh"), col("r").as("ra"))
      .join(prefix.select(col(idCol).as("doc_b"), col("sz").as("sz_b"),
        col("sh"), col("r").as("rb")), Seq("sh"))
      .where(col("doc_a") < col("doc_b") &&
        col("sz_b") >= safeCeil(col("sz_a") * threshold) &&
        col("sz_a") >= safeCeil(col("sz_b") * threshold))
      .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
      .agg(min("ra").as("ra"), min("rb").as("rb"))
      .where(lit(1) + least(col("sz_a") - col("ra"), col("sz_b") - col("rb")) >=
        safeCeil((col("sz_a") + col("sz_b")) * (threshold / (1.0 + threshold))))
      .select("doc_a", "doc_b")

    MinHashLSH.jaccard(cand, sh, idCol).where(col("jaccard") >= threshold)
  }
}
