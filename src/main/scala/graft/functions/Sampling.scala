package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting for
  * corpus curation: assignments depend only on the row's id (via md5), so
  * they are stable across runs, partitionings, engines, and cluster sizes
  * — the property a reproducible train/val/test split needs and
  * `rand()`-based sampling lacks. Pure column expressions: no shuffle, no
  * state, stream-safe, and replayable by any SQL oracle.
  */
object Sampling {

  /** 32-bit md5-derived bucket value in [0, 2^32) for an id column — the
    * shared randomness source for splits and samples.
    */
  def hashValue(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Stable split assignment: weights like Seq("train" -> 8, "val" -> 1,
    * "test" -> 1) partition the hash space proportionally; every id lands
    * in exactly one split, forever.
    */
  def hashSplit(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive, got $weights")
    val total = weights.map(_._2).sum
    val bucket = pmod(hashValue(id), lit(total))
    val (expr0, _) = weights.foldLeft((lit(null).cast("string"), 0L)) {
      case ((acc, cum), (name, w)) =>
        (when(bucket >= cum && bucket < cum + w, lit(name)).otherwise(acc),
          cum + w)
    }
    expr0
  }

  /** Deterministic Bernoulli(rate) keep-predicate: true for the stable
    * `rate` fraction of ids. Unlike `df.sample`, re-running, repartitioning
    * or growing the table never changes which surviving rows survive.
    */
  def hashSample(id: Column, rate: Double): Column = {
    require(rate >= 0.0 && rate <= 1.0, s"rate=$rate out of [0,1]")
    // 2^32 * rate as an exact long bound — portable integer compare
    hashValue(id) < math.round(4294967296.0 * rate)
  }

  /** Epoch-weighted corpus mixing — the training-mixture operator ("web at
    * 1 epoch, books at 2.5, code at 0.3"): every row of a domain with
    * weight `w` is replicated `floor(w)` times and receives one further
    * copy for the stable `w - floor(w)` fraction of ids, yielding an
    * expected `w` epochs per domain with zero randomness. Output = input
    * columns + `epoch` (0-based int); a domain absent from `weights` gets
    * `default`, and weight 0 drops the domain entirely.
    *
    * Scale shape: NO shuffle and no driver data — the weights ship inside
    * the plan (a map literal lookup), replication is a map-only
    * `explode(sequence(...))` whose length is `ceil(w)`, and the
    * fractional-epoch keep is the same md5 predicate as [[hashSample]],
    * salted with the epoch index so consecutive fractional epochs of a
    * pipeline (e.g. re-mixing a grown corpus) draw independent subsets.
    * Every decision depends only on (id, epoch, weights) — reruns,
    * repartitioning and engines agree row for row, so a DuckDB oracle
    * replays the exact multiset.
    */
  def epochMix(df: org.apache.spark.sql.DataFrame, idCol: String,
               domainCol: String, weights: Map[String, Double],
               default: Double = 1.0): org.apache.spark.sql.DataFrame = {
    require(weights.values.forall(_ >= 0) && default >= 0,
      s"weights must be non-negative, got $weights default=$default")
    expandEpochs(
      df.withColumn("__w", coalesce(
        try_element_at(typedLit(weights), col(domainCol)), lit(default))),
      idCol)
  }

  /** Token-budget corpus mixing — resample each domain to a target share
    * of a fixed token budget (the "mix to 30% code / 70% web at 1T
    * tokens" shape): per-domain weight `w_d = totalTokens * share_d /
    * tokens_d` is DERIVED from a census of the corpus itself, then applied
    * exactly like [[epochMix]] — downsampling when the domain is
    * over-budget (w < 1), epoch-upsampling when under (w > 1). Domains
    * absent from `shares` are dropped (a mixture is exhaustive by
    * construction; list a domain explicitly to keep it).
    *
    * Scale shape: ONE extra partial-agg shuffle producing one census row
    * per domain, broadcast back onto the fact scan; everything after is
    * the map-only epoch expansion. The census/broadcast pair is the same
    * pattern as d30's corpus totals; determinism is inherited — `w_d` is
    * one IEEE double expression of (budget, share, census) that any SQL
    * oracle reproduces bit for bit.
    */
  def tokenBudgetMix(df: org.apache.spark.sql.DataFrame, idCol: String,
                     domainCol: String, textCol: String, totalTokens: Long,
                     shares: Map[String, Double]): org.apache.spark.sql.DataFrame = {
    require(totalTokens > 0, s"totalTokens=$totalTokens must be positive")
    require(shares.nonEmpty && shares.values.forall(_ > 0),
      s"shares must be positive, got $shares")
    val census = df
      .groupBy(col(domainCol))
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("__toks"))
      .withColumn("__share", try_element_at(typedLit(shares), col(domainCol)))
      .where(col("__share").isNotNull)
      .withColumn("__w", lit(totalTokens) * col("__share") / col("__toks"))
      .select(col(domainCol), col("__w"))
    // the USING join moves the domain column first — restore the caller's
    // column order so the contract (input columns + epoch) holds here too
    expandEpochs(df.join(broadcast(census), Seq(domainCol)), idCol)
      .select((df.columns.map(col) :+ col("epoch")): _*)
  }

  /** Distribution-matched resampling — rebalance a corpus to target
    * domain SHARES by pure downsampling (no replication): the binding
    * domain (smallest count_d / target_d) keeps everything, every other
    * domain keeps `rate_d = target_d * N_out / count_d` of its rows where
    * `N_out = min_d(count_d / target_d)` — the largest output satisfying
    * the target mix without upsampling. The "make the web dump 30% code"
    * operator; for epoch-replicated variants see [[tokenBudgetMix]].
    *
    * Domains absent from `targets` are dropped; target domains absent
    * from the corpus are ignored (their mass is unreachable by
    * downsampling — the caller sees it in the returned rates).
    *
    * Scale shape: ONE partial-agg census shuffle (one row per domain),
    * the min-ratio reduced on that tiny frame, rates broadcast back onto
    * the fact scan, then a map-only md5 keep predicate ([[hashSample]]
    * with a per-domain rate — stable across runs/engines/partitionings).
    * The rate is one IEEE double expression of (targets, counts), so a
    * SQL oracle replays the keep decision bit for bit.
    */
  def matchDistribution(df: org.apache.spark.sql.DataFrame, idCol: String,
                        domainCol: String,
                        targets: Map[String, Double]): org.apache.spark.sql.DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      s"target shares must be positive, got $targets")
    val census = df
      .groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("__cnt"))
      .withColumn("__tgt", try_element_at(typedLit(targets), col(domainCol)))
      .where(col("__tgt").isNotNull)
    val nOut = census.agg(min(col("__cnt") / col("__tgt")).as("__nout"))
    val rates = census.crossJoin(broadcast(nOut))
      .select(col(domainCol),
        (col("__tgt") * col("__nout") / col("__cnt")).as("__rate"))
    df.join(broadcast(rates), Seq(domainCol))
      .where(hashValue(col(idCol)) <
        round(col("__rate") * 4294967296.0).cast("long"))
      .withColumn("rate", round(col("__rate"), 6))
      .drop("__rate")
      .select((df.columns.map(col) :+ col("rate")): _*)
  }

  /** Temperature-scaled domain rebalancing (Devlin et al. 2019 mBERT
    * exponential smoothing; mT5/XLM-R's sampling knob): domain d's target
    * share becomes `q_d ∝ p_d^(1/T)` — T=1 keeps the natural mix, T→∞
    * approaches uniform, intermediate T up-weights the tail without the
    * hard uniform floor [[matchDistribution]]'s fixed targets impose.
    * Realized by pure downsampling, largest output first (exactly
    * [[matchDistribution]]'s N_out construction with computed targets):
    * the binding domain keeps everything, the rest keep
    * `q_d·N_out/count_d`. Since p_d = count_d/N and the total cancels in
    * the normalization, masses are `count_d^(1/T)` directly.
    *
    * Scale shape: the [[matchDistribution]] plan verbatim — one census
    * partial-agg, two scalar reductions over the domain-sized frame,
    * broadcast rates, map-only md5 keep. Determinism: `pow` is the one
    * libm call in the sampling family, so the rate is settled onto the
    * 1e-6 grid BEFORE the keep threshold — a 1-ulp cross-engine pow
    * divergence dies at the rounding instead of flipping a keep bit.
    * Returns input columns + `rate` (the domain's realized keep rate).
    */
  def temperatureMix(df: org.apache.spark.sql.DataFrame, idCol: String,
                     domainCol: String,
                     temperature: Double): org.apache.spark.sql.DataFrame = {
    require(temperature >= 1,
      s"temperature=$temperature must be >= 1 (1 = natural mix, larger " +
        "flattens toward uniform); sharpening T<1 would overflow the " +
        "1e-6 integer-grid mass for large domains (cnt^(1/T) > 2^63) " +
        "and is not what the published knob does")
    // NULL-domain rows are dropped, and dropped BEFORE the census: a null
    // group would otherwise contribute mass to the normalization (skewing
    // every real domain's rate, and breaking "the binding domain keeps
    // everything") while its rows silently vanish at the rate join — the
    // matchDistribution unlisted-domain discipline applied to null.
    val pts = df.where(col(domainCol).isNotNull)
    // masses on the 1e-6 integer grid, summed as LONGS (d30's order-free
    // discipline): pow is a libm call, so its 1-ulp cross-engine wobble
    // dies at the per-domain grid; the normalizer is then an exact
    // integer sum rather than an order-dependent float reduction.
    val census = pts
      .groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("__cnt"))
      .withColumn("__mg",
        round(pow(col("__cnt"), lit(1.0 / temperature)) * 1e6, 0).cast("long"))
    val msum = census.agg(sum(col("__mg")).as("__msumg"))
    val q = census.crossJoin(broadcast(msum))
      .select(col(domainCol), col("__cnt"),
        (col("__mg").cast("double") / col("__msumg").cast("double")).as("__q"))
    val nOut = q.agg(min(col("__cnt") / col("__q")).as("__nout"))
    val rates = q.crossJoin(broadcast(nOut))
      .select(col(domainCol),
        round(col("__q") * col("__nout") / col("__cnt"), 6).as("__rate"))
    pts.join(broadcast(rates), Seq(domainCol))
      .where(hashValue(col(idCol)) <
        round(col("__rate") * 4294967296.0).cast("long"))
      .withColumn("rate", col("__rate"))
      .drop("__rate")
      .select((df.columns.map(col) :+ col("rate")): _*)
  }

  /** Leakage-safe split: [[hashSplit]] keyed on a GROUP column (domain,
    * url host, dedup-cluster id) instead of the row id, so every member of
    * a group lands in the SAME split. This is the standard guard against
    * train/test leakage through near-duplicates: id-keyed splits let two
    * near-identical docs from one site straddle the boundary (the
    * contamination d26/d35 then have to catch); group-keyed splits make
    * that impossible by construction for within-group duplicates. Pure
    * map-only column expression, stable forever, stream-safe.
    */
  def groupSplit(df: org.apache.spark.sql.DataFrame, keyCol: String,
                 weights: Seq[(String, Int)]): org.apache.spark.sql.DataFrame =
    df.withColumn("split", hashSplit(col(keyCol), weights))

  /** Exact per-stratum quotas — "k docs per domain" (eval-set and
    * calibration-sample construction, where [[matchDistribution]]'s
    * rate-based keep gives only EXPECTED counts): rows rank within their
    * stratum by (md5(id), id) — a stable shuffle order — and keep
    * `rank <= quota(stratum)`. Deterministic and engine-replayable; a
    * stratum short of its quota keeps everything it has.
    *
    * Scale shape: ONE hash-partition-by-stratum exchange + per-stratum
    * sort. Quota selection is a top-k per group; the per-stratum sort is
    * the honest cost (rank needs a total order) and holds while strata
    * fit an executor's spill budget — the usual case for domain strata.
    * For quotas over a HANDFUL of giant strata, use
    * [[stratifiedQuotaCensus]]: identical rows AND ranks, no
    * stratum-sized sort. Output = input columns + `rk` (1-based rank in
    * the kept order).
    */
  def stratifiedQuota(df: org.apache.spark.sql.DataFrame, idCol: String,
                      domainCol: String,
                      quotas: Map[String, Int],
                      default: Int = 0): org.apache.spark.sql.DataFrame = {
    require(quotas.values.forall(_ >= 0) && default >= 0,
      s"quotas must be non-negative, got $quotas default=$default")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(hashValue(col(idCol)), col(idCol))
    df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= coalesce(
        try_element_at(typedLit(quotas), col(domainCol)), lit(default)))
  }

  /** [[stratifiedQuota]] without the stratum-sized sort — the GIANT-
    * stratum path: identical rows AND identical ranks (spec-pinned
    * equivalence on skewed fixtures), but the only sort in the plan runs
    * over ~quota-sized candidate sets, so one billion-row domain no
    * longer funnels through a single task's sort/spill.
    *
    * Two passes:
    *  1. '''census''': rows bucket by the TOP `bucketBits` bits of their
    *     md5 hash (high bits, so bucket order = hash order); one
    *     partial-agg exchange builds the per-(stratum, bucket) census
    *     (≤ 2^bucketBits rows per stratum — corpus-size-free), a
    *     census-sized window takes the running count, and the per-stratum
    *     THRESHOLD bucket is the first whose cumulative count reaches the
    *     quota. Everything after it cannot contain a kept row; everything
    *     before it is entirely kept.
    *  2. '''boundary fix-up''': rows at-or-below the threshold bucket
    *     (≈ quota + stratum/2^bucketBits rows — md5 is uniform) join the
    *     broadcast threshold table and rank with the SAME (md5, id)
    *     window as the one-pass form. Every discarded row ordered after
    *     every candidate, so candidate-local ranks ARE global ranks.
    *
    * Cost trade: the input is read twice (the census pass is a two-column
    * projection — column-pruned at the scan), which buys the sort bound.
    * A stratum SHORTER than its quota never crosses the threshold and
    * keeps everything, ranked — its full sort is quota-bounded by
    * definition. Same output contract as [[stratifiedQuota]].
    */
  def stratifiedQuotaCensus(df: org.apache.spark.sql.DataFrame, idCol: String,
                            domainCol: String,
                            quotas: Map[String, Int],
                            default: Int = 0,
                            bucketBits: Int = 12): org.apache.spark.sql.DataFrame = {
    require(quotas.values.forall(_ >= 0) && default >= 0,
      s"quotas must be non-negative, got $quotas default=$default")
    require(bucketBits >= 1 && bucketBits <= 31,
      s"bucketBits=$bucketBits must be in [1,31]")
    val quota = coalesce(
      try_element_at(typedLit(quotas), col(domainCol)), lit(default))
    val bucket = shiftrightunsigned(hashValue(col(idCol)), 32 - bucketBits)
    val census = df.select(col(domainCol), bucket.as("__b"))
      .groupBy(col(domainCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(domainCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val thr = census
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .where(col("__cum") >= quota)
      .groupBy(col(domainCol)).agg(min(col("__b")).as("__thr"))
    // |thr| = |strata with >= quota rows| — broadcast-sized; a stratum
    // with no threshold (shorter than its quota) keeps all its rows
    val cand = df
      .join(broadcast(thr), Seq(domainCol), "left")
      .where(bucket <= coalesce(col("__thr"), lit(Long.MaxValue)))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(hashValue(col(idCol)), col(idCol))
    cand.withColumn("rk", row_number().over(w))
      .where(col("rk") <= quota)
      .select((df.columns.map(col) :+ col("rk")): _*)
  }

  /** Weighted sampling WITHOUT replacement, n per domain, inclusion
    * probability proportional to a weight column (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006: rank rows by
    * key `u^(1/w)` — equivalently `ln(u)/w` — and keep the top n; the
    * kept set is distributed exactly as sequential weighted draws without
    * replacement). The curriculum/data-mixing primitive "sample docs
    * proportional to quality/length within each domain" that uniform
    * [[stratifiedQuota]] cannot express.
    *
    * Deterministic: `u = (hashValue(id)+1)/2^32` — the same md5 source as
    * every split/sample here, so reruns, repartitioning and engines agree
    * row for row, and a DuckDB oracle replays the exact selection
    * (`ln` is the shared libm surface d23/d30 already gate). Rows with
    * NULL or non-positive weight are excluded (they have zero sampling
    * mass, and `ln(u)/0` is not a number). Ties (same key AND same id —
    * impossible for distinct ids) cannot occur; the id tie-break keeps
    * the window order total regardless.
    *
    * Scale shape: one exchange on the domain key (the same window as
    * [[stratifiedQuota]]); no global sort, no driver data. A single
    * mega-domain makes that partition's sort O(|domain| log |domain|) —
    * the documented [[graft.ops.SkewSalt]] opt-in applies (two-phase
    * top-n: per-salt top-n, then top-n of the union).
    *
    * Returns input columns + `rk` (1-based rank within the kept sample).
    */
  def weightedSample(df: org.apache.spark.sql.DataFrame, idCol: String,
                     weightCol: String, domainCol: String,
                     n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 0, s"n=$n must be non-negative")
    val u = (hashValue(col(idCol)).cast("double") + lit(1.0)) / lit(4294967296.0)
    val key = log(u) / col(weightCol).cast("double")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(key.desc, col(idCol))
    df.where(col(weightCol).isNotNull && col(weightCol) > 0 &&
        !isnan(col(weightCol).cast("double")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= n)
  }

  /** Skew-safe [[weightedSample]]: identical output (rows AND ranks),
    * computed in two phases so no single task ever sorts a mega-domain.
    * Phase 1 takes each (domain, salt) slice's top n — EXACT, because any
    * row of the global top n is necessarily in its own salt slice's top n
    * (fewer competitors); phase 2 re-ranks only the ≤ `salts`·n survivors
    * per domain. Two exchanges, the second over a frame bounded by
    * salts·n·|domains| regardless of corpus size — the
    * [[graft.ops.SkewSalt]] two-phase shape applied to top-n.
    */
  def weightedSampleSalted(df: org.apache.spark.sql.DataFrame, idCol: String,
                           weightCol: String, domainCol: String,
                           n: Int, salts: Int = 32): org.apache.spark.sql.DataFrame = {
    require(n >= 0 && salts > 0, s"n=$n salts=$salts out of range")
    val u = (hashValue(col(idCol)).cast("double") + lit(1.0)) / lit(4294967296.0)
    val key = log(u) / col(weightCol).cast("double")
    val salt = pmod(hashValue(col(idCol)) + lit(1L), lit(salts.toLong))
    val w1 = Window.partitionBy(col(domainCol), salt).orderBy(key.desc, col(idCol))
    val w2 = Window.partitionBy(col(domainCol)).orderBy(key.desc, col(idCol))
    df.where(col(weightCol).isNotNull && col(weightCol) > 0 &&
        !isnan(col(weightCol).cast("double")))
      .withColumn("__srk", row_number().over(w1))
      .where(col("__srk") <= n)
      .drop("__srk")
      .withColumn("rk", row_number().over(w2))
      .where(col("rk") <= n)
  }

  /** Exact percentile calibration of a score column — turns raw filter
    * scores into corpus-relative percentiles, which is how quality-filter
    * cutoffs are actually chosen ("drop the bottom 30%", DCLM/fastText
    * practice) — a fixed raw-score threshold drifts with every corpus.
    * `pct` = SQL `percent_rank()` = (#rows strictly below) / (N − 1),
    * ties sharing a value; 0 when N = 1. NULL scores: the row is KEPT
    * with `pct` NULL and does not count toward N — a divergence from SQL
    * `percent_rank()` (which ranks NULLs as a tie group) chosen because a
    * NULL quality score means "unscored", and an unscored doc must neither
    * pass nor fail a percentile cutoff silently.
    *
    * Scale shape: the corpus is NEVER globally sorted. A score CENSUS
    * (one row per distinct value — producer scores are grid-rounded, so
    * cardinality is bounded by the grid, not the corpus) takes one
    * partial-agg exchange; the strictly-below running count is a window
    * over that census alone, and the result broadcast-joins back onto the
    * corpus — the same census/broadcast shape as [[tokenBudgetMix]].
    * Returns input columns + `pct` (1e-6 grid).
    */
  def percentileCalibrate(df: org.apache.spark.sql.DataFrame,
                          scoreCol: String): org.apache.spark.sql.DataFrame = {
    // S4 persist rule: the below-window branch and the totals branch both
    // read the census; unpersisted, the corpus scan + score evaluation
    // (often an expensive formula) would run once per branch. The census
    // is distinct-score-sized — cheap to hold.
    val census = graft.CacheRegistry.track(
      df.where(col(scoreCol).isNotNull)
        .groupBy(col(scoreCol)).agg(count(lit(1)).as("__c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val w = Window.orderBy(scoreCol)
    val below = census.withColumn("__below",
      coalesce(sum("__c").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tot = census.agg(sum("__c").cast("long").as("__n"))
    // LEFT join so NULL-score rows survive (join keys never match NULL);
    // their pct is NULL both via the missing __below and the explicit
    // isNull guard (which also covers the N=1 corpus with a NULL row)
    df.join(broadcast(below.select(col(scoreCol), col("__below"))),
        Seq(scoreCol), "left")
      .crossJoin(broadcast(tot))
      .withColumn("pct", when(col(scoreCol).isNull, lit(null).cast("double"))
        .when(col("__n") === 1, lit(0.0))
        .otherwise(round(col("__below").cast("double") / (col("__n") - 1), 6)))
      .select((df.columns.map(col) :+ col("pct")): _*)
  }

  /** Per-domain quantile SUMMARY — p50/p90/p99-style corpus health stats
    * per source/language, the grouped complement of
    * [[percentileCalibrate]] (that one attaches a per-ROW percentile;
    * this one reduces each domain to a few quantile points a curation
    * dashboard or mix designer reads directly).
    *
    * Quantile definition: the inverted CDF without interpolation —
    * `q(p) = smallest value v with 100·cum(v) >= p·N` (ties share their
    * value; `pcts` are integer percents, so the comparison is EXACT
    * integer arithmetic — no `ceil(0.9·N)` float round-trip whose last
    * ulp an external engine might disagree on).
    *
    * Scale shape: the corpus is NEVER sorted. One partial-agg exchange
    * builds the per-(domain, value) census (producer scores are
    * grid-rounded, so |census| is |domains| × grid, corpus-size-free);
    * the running count and the quantile picks are a window + groupBy over
    * THAT census. Null values are excluded (no order against null); an
    * all-null or empty domain vanishes from the output.
    *
    * Output: (domCol, n_rows, p<pct>... ) — value columns keep the input
    * value type.
    *
    * `gridDecimals`: optional pre-census rounding (`round(v, d)`), the
    * parity knob for [[graft.streaming.QuantileStream.quantilesByDomain]]
    * — the streaming twin ALWAYS grid-rounds (its state bound is the
    * grid), so feed ungridded data to both with the SAME gridDecimals to
    * keep batch and stream answers identical. The batch default (None)
    * keeps the exact census: a batch census row per raw distinct value
    * is a shuffle-size matter, not an unbounded-state one.
    */
  def quantilesByDomain(df: org.apache.spark.sql.DataFrame, domCol: String,
                        valueCol: String,
                        pcts: Seq[Int] = Seq(50, 90, 99),
                        gridDecimals: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percents in [1,100], got $pcts")
    require(gridDecimals.forall(d => d >= 0 && d <= 9),
      s"gridDecimals must be in [0,9], got $gridDecimals")
    val v = gridDecimals.fold(col(valueCol))(d => round(col(valueCol), d))
    val census = df
      .where(col(domCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(domCol).as("__d"), v.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("__d").orderBy("__v")
    val cum = census
      .withColumn("__cum", sum("__c").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", sum("__c").over(Window.partitionBy("__d")))
    val picks = pcts.map(p =>
      min(when(col("__cum") * 100 >= col("__n") * p, col("__v"))).as(s"p$p"))
    cum.groupBy(col("__d").as(domCol))
      .agg(max(col("__cum")).as("n_rows"), picks: _*)
  }

  /** Shared epoch expansion: rows arrive with a `__w` weight column and
    * leave replicated into kept (row, epoch) pairs. The generator input is
    * cheap arithmetic (`sequence` over ceil(w)), so Spark's
    * filter-into-generator inference re-evaluating it costs nothing.
    */
  private def expandEpochs(df: org.apache.spark.sql.DataFrame,
                           idCol: String): org.apache.spark.sql.DataFrame =
    df.where(col("__w") > 0)
      .withColumn("epoch", explode(sequence(lit(0),
        ceil(col("__w")).cast("int") - 1, lit(1))))
      .where(col("epoch") < floor(col("__w")).cast("int") ||
        hashValue(concat(col(idCol).cast("string"), lit(":"),
          col("epoch").cast("string"))) <
          round((col("__w") - floor(col("__w"))) * 4294967296.0).cast("long"))
      .drop("__w")

  /** Source-mixture entropy census — the one-row diversity monitor a
    * mixture pipeline watches per release: Shannon entropy of the
    * domain/source distribution plus its evenness against the uniform
    * mixture (`H / ln k` — 1.0 means perfectly balanced, →0 means one
    * source dominates). The signal [[epochMix]]/[[matchDistribution]]
    * change; this is the meter that says whether they need to.
    *
    * One partial-agg census (domains), a broadcast 1-row total, and a
    * per-domain map — no corpus-sized shuffle beyond the domain groupBy.
    * Determinism ([[graft.functions.TextAnalysis.unigramLogProb]]'s
    * discipline): each domain's `−p·ln p` term is rounded onto the 1e-6
    * grid and summed as a LONG; the evenness ratio divides grid longs, so
    * the result replays exactly in any engine whose `ln` agrees on the
    * shared doubles (the same dependency every ln-based green oracle has).
    * NULL domains count as a domain, matching SQL GROUP BY.
    *
    * Returns ONE row: (n_sources, n_docs, entropy_micro, evenness_micro).
    */
  def mixtureEntropy(df: org.apache.spark.sql.DataFrame,
                     domainCol: String): org.apache.spark.sql.DataFrame =
    mixtureEntropyFromCensus(
      df.groupBy(col(domainCol).as("__d"))
        .agg(count(lit(1)).cast("long").as("__c")), "__d", "__c")

  /** The grid-combine half of [[mixtureEntropy]], over an ALREADY-BUILT
    * (domain, count) census — the one definition shared by the batch
    * operator and the streaming twin ([[graft.streaming.DocStream]]'s
    * entropy stream maintains the census live and hands its final rows
    * here), so the two paths cannot drift. Also the standing-artifact
    * entry point: a persisted per-release census answers the meter
    * without re-reading the corpus (the [[CorpusCatalog]] contract).
    */
  def mixtureEntropyFromCensus(census: org.apache.spark.sql.DataFrame,
                               domCol: String,
                               cntCol: String): org.apache.spark.sql.DataFrame = {
    val cnt = census.select(col(domCol).as("__d"),
      col(cntCol).cast("long").as("__c"))
    val tot = broadcast(cnt.agg(sum("__c").cast("long").as("__n"),
      count(lit(1)).cast("long").as("__k")))
    // the oracle mirrors this expression tree verbatim (float ops are
    // order-sensitive): -(c/n) * ln(c/n) * 1e6, c widened to double first
    val p = col("__c").cast("double") / col("__n")
    cnt.crossJoin(tot)
      .select(round(-p * log(p) * lit(1e6), 0).cast("long").as("__t"),
        col("__n"), col("__k"))
      .groupBy("__n", "__k").agg(sum("__t").cast("long").as("entropy_micro"))
      .selectExpr("__k AS n_sources", "__n AS n_docs", "entropy_micro",
        ("CASE WHEN __k <= 1 THEN CAST(1000000 AS BIGINT)" +
          " ELSE entropy_micro * 1000000 div CAST(round(ln(CAST(__k AS" +
          " DOUBLE)) * 1000000, 0) AS BIGINT) END AS evenness_micro"))
  }

  /** Mutual information between two categorical columns on the 1e-6
    * integer grid — the dependence meter next to [[mixtureEntropy]]'s
    * diversity meter: `I(A;B) = H(A) + H(B) − H(A,B)` says whether two
    * stratification axes (language × source, domain × quality bucket)
    * carry independent signal or duplicate each other, which decides
    * whether a mixture policy needs the joint grid or the marginals
    * suffice. Normalized form `I/min(H_A,H_B)` ∈ [0,1] (Kvålseth 1987)
    * rides along for comparability across column pairs.
    *
    * All three entropies use the [[mixtureEntropy]] discipline — per-cell
    * `round(−p·ln p·1e6)` longs, summed exactly — and the combination is
    * pure long arithmetic, so the row is engine-replayable bit-for-bit
    * (per-term rounding can leave `mi_micro` a few micro-nats negative on
    * independent data; it is emitted raw, not clamped, because the raw
    * value is the replayable one).
    *
    * ONE corpus pass: the (a,b) joint census is the only corpus-sized
    * shuffle (bounded by |A|·|B| cells); marginals and totals re-aggregate
    * the persisted census rows, and the three 1-row entropies meet in
    * broadcast crossJoins. Returns ONE row: (n_rows, n_a, n_b, n_cells,
    * h_a_micro, h_b_micro, h_ab_micro, mi_micro, nmi_micro).
    */
  def mutualInformation(df: org.apache.spark.sql.DataFrame,
                        aCol: String, bCol: String): org.apache.spark.sql.DataFrame = {
    val joint = graft.CacheRegistry.track(
      df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
        .agg(count(lit(1)).cast("long").as("__c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val tot = broadcast(joint.agg(
      coalesce(sum("__c"), lit(0L)).cast("long").as("__n"),
      count(lit(1)).cast("long").as("__cells")))
    // the oracle mirrors this expression tree verbatim (float ops are
    // order-sensitive): -(c/n) * ln(c/n) * 1e6 per cell, summed as longs
    def entMicro(census: org.apache.spark.sql.DataFrame, h: String,
                 k: String): org.apache.spark.sql.DataFrame = {
      val p = col("__c").cast("double") / col("__n")
      census.crossJoin(tot)
        .select(round(-p * log(p) * lit(1e6), 0).cast("long").as("__t"))
        .agg(coalesce(sum("__t"), lit(0L)).cast("long").as(h),
          count(lit(1)).cast("long").as(k))
    }
    val ha = entMicro(joint.groupBy("__a").agg(sum("__c").as("__c")),
      "h_a_micro", "n_a")
    val hb = entMicro(joint.groupBy("__b").agg(sum("__c").as("__c")),
      "h_b_micro", "n_b")
    val hab = entMicro(joint, "h_ab_micro", "__nc")
    ha.crossJoin(broadcast(hb)).crossJoin(broadcast(hab)).crossJoin(tot)
      .selectExpr("__n AS n_rows", "n_a", "n_b", "__cells AS n_cells",
        "h_a_micro", "h_b_micro", "h_ab_micro",
        "h_a_micro + h_b_micro - h_ab_micro AS mi_micro",
        // nmi divides a CLAMPED-at-0 numerator: a rounding-negative MI is
        // noise, and keeping the dividend non-negative is what lets
        // truncating `div` and the oracle's floor `//` agree (the d133
        // signed-division lesson)
        ("CASE WHEN least(h_a_micro, h_b_micro) <= 0" +
          " OR h_a_micro + h_b_micro - h_ab_micro <= 0 THEN CAST(0 AS BIGINT)" +
          " ELSE (h_a_micro + h_b_micro - h_ab_micro) * 1000000" +
          " div least(h_a_micro, h_b_micro) END AS nmi_micro"))
  }

  /** Jensen–Shannon divergence between two corpora's domain distributions
    * on the 1e-6 integer grid — the drift meter that closes the release
    * loop: [[mixtureEntropy]] says how diverse ONE release's mixture is,
    * [[mutualInformation]] whether two axes within it are redundant, JSD
    * says how far release P has MOVED from reference Q
    * (`JSD = H(M) − (H(P)+H(Q))/2`, `M = (P+Q)/2`; Lin 1991) — symmetric,
    * always finite (unlike KL, which blows up on any domain Q lacks —
    * exactly the new-source-appeared case a drift monitor exists to
    * catch), and bounded by `ln 2`.
    *
    * Same grid discipline as [[mixtureEntropy]]: per-domain
    * `round(−p·ln p·1e6)` long terms for each of H(P), H(Q), H(M), summed
    * exactly. To keep the combination in pure long arithmetic the row
    * carries `jsd2_micro = 2·H(M) − H(P) − H(Q)` (twice the divergence —
    * no halving truncation), emitted RAW: per-term rounding can leave it
    * a few micro-nats outside [0, 2·ln 2·1e6], and the raw value is the
    * replayable one. The normalized `jsd_norm_micro` divides the
    * clamped-at-0 value by `2·round(ln 2·1e6)` (non-negative dividend, so
    * truncating `div` == floor `//` — the d133 lesson); rounding can land
    * it a hair above 1e6 on fully disjoint supports.
    *
    * Plan: one census groupBy per side (the only corpus-sized shuffles),
    * a census-sized full-outer join on domain (persisted, read twice),
    * broadcast 1-row totals, one term pass. Missing domains contribute 0
    * to their side and `c/(2n)` to the mixture — the guarded CASE keeps
    * an empty side NaN-free.
    *
    * Returns ONE row: (n_p, n_q, k_p, k_q, k_union, h_p_micro, h_q_micro,
    * h_m_micro, jsd2_micro, jsd_norm_micro).
    */
  def jensenShannon(p: org.apache.spark.sql.DataFrame,
                    q: org.apache.spark.sql.DataFrame,
                    domainCol: String): org.apache.spark.sql.DataFrame =
    jensenShannonFromCensus(
      p.groupBy(col(domainCol).as("__d"))
        .agg(count(lit(1)).cast("long").as("__c")),
      q.groupBy(col(domainCol).as("__d"))
        .agg(count(lit(1)).cast("long").as("__c")),
      "__d", "__c")

  /** The grid-combine half of [[jensenShannon]], over two ALREADY-BUILT
    * (domain, count) censuses — shared by the batch operator and the
    * streaming drift twin (live census vs reference census), and the
    * standing-artifact entry point: two persisted per-release censuses
    * answer the drift question with zero corpus passes (the
    * [[CorpusCatalog]] contract).
    */
  def jensenShannonFromCensus(censusP: org.apache.spark.sql.DataFrame,
                              censusQ: org.apache.spark.sql.DataFrame,
                              domCol: String,
                              cntCol: String): org.apache.spark.sql.DataFrame = {
    val cp = censusP.select(col(domCol).as("__d"),
      col(cntCol).cast("long").as("__cp"))
    val cq = censusQ.select(col(domCol).as("__d"),
      col(cntCol).cast("long").as("__cq"))
    val j = graft.CacheRegistry.track(cp.join(cq, Seq("__d"), "full_outer")
      .select(coalesce(col("__cp"), lit(0L)).as("__cp"),
        coalesce(col("__cq"), lit(0L)).as("__cq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val tot = broadcast(j.agg(
      coalesce(sum("__cp"), lit(0L)).cast("long").as("__np"),
      coalesce(sum("__cq"), lit(0L)).cast("long").as("__nq"),
      count(lit(1)).cast("long").as("__ku"),
      coalesce(sum(when(col("__cp") > 0, 1L).otherwise(0L)), lit(0L))
        .cast("long").as("__kp"),
      coalesce(sum(when(col("__cq") > 0, 1L).otherwise(0L)), lit(0L))
        .cast("long").as("__kq")))
    // the oracle mirrors these expression trees verbatim (float ops are
    // order-sensitive): guarded c/n per side (0.0 when the side lacks the
    // domain — also what keeps an empty side off 0/0), mixture = the
    // guarded halves' mean, each term -x * ln(x) * 1e6 rounded to a long
    val pp = when(col("__cp") > 0,
      col("__cp").cast("double") / col("__np")).otherwise(lit(0.0))
    val qq = when(col("__cq") > 0,
      col("__cq").cast("double") / col("__nq")).otherwise(lit(0.0))
    val mm = (pp + qq) / lit(2.0)
    val terms = j.crossJoin(tot).select(
      when(col("__cp") > 0, round(-pp * log(pp) * lit(1e6), 0).cast("long"))
        .otherwise(lit(0L)).as("__tp"),
      when(col("__cq") > 0, round(-qq * log(qq) * lit(1e6), 0).cast("long"))
        .otherwise(lit(0L)).as("__tq"),
      round(-mm * log(mm) * lit(1e6), 0).cast("long").as("__tm"))
      .agg(coalesce(sum("__tp"), lit(0L)).cast("long").as("h_p_micro"),
        coalesce(sum("__tq"), lit(0L)).cast("long").as("h_q_micro"),
        coalesce(sum("__tm"), lit(0L)).cast("long").as("h_m_micro"))
    terms.crossJoin(tot)
      .selectExpr("__np AS n_p", "__nq AS n_q", "__kp AS k_p",
        "__kq AS k_q", "__ku AS k_union",
        "h_p_micro", "h_q_micro", "h_m_micro",
        "2 * h_m_micro - h_p_micro - h_q_micro AS jsd2_micro",
        ("CASE WHEN 2 * h_m_micro - h_p_micro - h_q_micro <= 0" +
          " THEN CAST(0 AS BIGINT)" +
          " ELSE (2 * h_m_micro - h_p_micro - h_q_micro) * 1000000" +
          " div (2 * CAST(round(ln(CAST(2 AS DOUBLE)) * 1000000, 0)" +
          " AS BIGINT)) END AS jsd_norm_micro"))
  }
}
