package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection for document corpora.
  *
  * Scale design (the point of LSH): candidate pairs come from equality joins
  * on band keys — a shuffle on small keys — never from an O(n²) cross join.
  * At 100 TB the stages are: shingle explode (map-only) → per-(doc, seed) min
  * (partial agg) → band-key join (shuffle on band key) → exact-Jaccard
  * verification restricted to candidates.
  *
  * Hashes are md5-derived (first 8 hex chars per seed), so an external SQL
  * engine can replay the exact signature — no JVM-private hash functions.
  */
object MinHashLSH {

  /** Distinct n-word shingles per doc: (id, shingle) rows.
    * Docs shorter than n words produce no rows (matching `range()` semantics
    * in SQL oracles).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val w = split(lower(col(textCol)), " ")
    val sh = transform(
      sequence(lit(0), size(w) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(w, i + o + 1)): _*))
    df.where(size(w) >= n)
      .select(col(idCol), explode(sh).as("sh"))
      .distinct()
  }

  /** Seeded 32-bit hash of a shingle: first 8 hex chars of md5("<j>:<sh>"). */
  def seededHash(j: Column, sh: Column): Column =
    conv(substring(md5(concat(j.cast("string"), lit(":"), sh)), 1, 8), 16, 10).cast("long")

  /** MinHash signature: one row per (id, seed j in [0,k)) with the min
    * seeded hash over the doc's shingles. One explode + one partial agg.
    */
  def signature(sh: DataFrame, idCol: String, k: Int = 8): DataFrame = {
    val seeds = explode(sequence(lit(0), lit(k - 1))).as("j")
    sh.select(col(idCol), col("sh"), seeds)
      .groupBy(col(idCol), col("j"))
      .agg(min(seededHash(col("j"), col("sh"))).as("mh"))
  }

  /** LSH banding with rows-per-band r: concat r consecutive signature values
    * into a band key. Returns (id, band, bkey).
    */
  def bands(sig: DataFrame, idCol: String, r: Int = 2): DataFrame = {
    require(r == 2, "band assembly currently specialized to r=2")
    sig.groupBy(col(idCol), expr("j div 2").as("band"))
      .agg(concat_ws(",",
        min(when(col("j") % 2 === 0, col("mh"))).cast("string"),
        min(when(col("j") % 2 === 1, col("mh"))).cast("string")).as("bkey"))
  }

  /** Candidate pairs (a < b) sharing at least one band key — the ONLY join
    * that scales: equality on (band, bkey), never a cross product.
    */
  def candidates(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("doc_a"), col("band"), col("bkey"))
    val b = bands.select(col(idCol).as("doc_b"), col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Exact shingle-set Jaccard for candidate pairs only. Pairs sharing no
    * shingle drop out (they were hash-collision candidates).
    */
  def jaccard(cand: DataFrame, sh: DataFrame, idCol: String): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col(idCol).as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col(idCol).as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("ni"))
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double"), 6).as("jaccard"))
  }

  /** End-to-end: candidate near-dup pairs with exact Jaccard attached.
    * The shingle set feeds four downstream subplans (signature, sizes, and
    * both sides of the intersection join), so it is cached — the one
    * materialized intermediate in the engine, and the LSH analog of the
    * reference's staged temp tables (SURVEY.md §2.1 S4: cache only what is
    * reused ≥2×).
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, k: Int = 8, r: Int = 2): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = candidates(bands(signature(sh, idCol, k), idCol, r), idCol)
    jaccard(cand, sh, idCol)
  }
}
