package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Property pins for [[DocStream.spaceSavingMerge]] — the ONE fold both
  * capped heavy-hitter operators and the d174 versioned synopsis share.
  * The d174 oracle gates these invariants on a specific two-batch split;
  * this spec gates them on RANDOM multisets under RANDOM batch
  * partitions (1..6 batches, arbitrary occurrence shuffles), which is
  * the actual claim a deployment relies on: the guarantees hold for
  * every arrival order, not just the tested one.
  *
  * Invariants (Metwally et al. 2005, adapted to the batch-census fold):
  *  - Σ est = N (every occurrence increments exactly one counter:
  *    tracked +c, fresh insert +c, evict-insert removes me and adds
  *    me+c);
  *  - |synopsis| = min(cap, #distinct tokens seen);
  *  - est ≥ true and est − err ≤ true for every tracked token (an
  *    untracked token's count never grows while untracked — re-arrival
  *    re-inserts — so the inherited `me` upper-bounds its pre-tracking
  *    history);
  *  - any token with true count > N/cap is tracked (Σest = N over cap
  *    counters ⇒ min est ≤ N/cap; an untracked heavy token would have
  *    true ≤ min est ≤ N/cap — contradiction).
  */
class SpaceSavingMergeSpec extends AnyFunSuite {

  private def foldBatches(batches: Seq[Seq[String]], cap: Int)
      : Map[String, (Long, Long)] =
    batches.foldLeft(Option.empty[Map[String, (Long, Long)]]) {
      (prior, batch) =>
        Some(DocStream.spaceSavingMerge(prior, batch.iterator, cap))
    }.getOrElse(Map.empty)

  test("SpaceSaving invariants hold for random multisets under random " +
    "batch partitions") {
    val rnd = new scala.util.Random(1816)
    for (trial <- 1 to 200) {
      val vocab = 1 + rnd.nextInt(60)
      val cap = 1 + rnd.nextInt(20)
      // zipf-ish skew so some tokens genuinely clear N/cap sometimes
      val occurrences = (0 until vocab).flatMap { i =>
        val c = 1 + rnd.nextInt(1 + 200 / (i + 1))
        Seq.fill(c)(s"t$i")
      }
      val shuffled = rnd.shuffle(occurrences.toVector)
      val nBatches = 1 + rnd.nextInt(6)
      // random cut points: batches of arbitrary (possibly zero) size
      val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(shuffled.size + 1))
        .sorted
      val batches = (0 +: cuts :+ shuffled.size).sliding(2).map {
        case Seq(a, b) => shuffled.slice(a, b)
      }.toSeq
      val syn = foldBatches(batches, cap)
      val truth = shuffled.groupBy(identity).map { case (t, v) =>
        t -> v.size.toLong
      }
      val n = shuffled.size.toLong
      val ctx = s"trial=$trial vocab=$vocab cap=$cap n=$n batches=" +
        batches.map(_.size).mkString("/")
      assert(syn.values.map(_._1).sum === n, s"sum(est) != N  [$ctx]")
      assert(syn.size === math.min(cap, truth.size), s"|synopsis|  [$ctx]")
      syn.foreach { case (t, (est, err)) =>
        assert(est >= truth(t), s"$t est < true  [$ctx]")
        assert(est - err <= truth(t), s"$t est-err > true  [$ctx]")
        assert(err >= 0, s"$t err < 0  [$ctx]")
      }
      truth.foreach { case (t, c) =>
        if (c * cap > n)
          assert(syn.contains(t), s"heavy $t (true=$c > N/cap) untracked  [$ctx]")
      }
    }
  }

  test("single-batch regime: tokens clearing N/cap are exact with err=0 " +
    "(the d169 contract, correctly conditioned)") {
    // The exactness claim is CONDITIONED on clearing the eviction
    // ceiling, not on rank: the descending fold inserts a heavy token
    // first with est = true, err = 0, and since Σest = N_sofar over cap
    // counters keeps min ≤ N_sofar/cap, a token with est > N/cap is
    // never the strict minimum and cannot be evicted. A merely
    // "top-cap by count" token BELOW the ceiling carries no such
    // guarantee — with vocab > cap, later evict-inserts inherit
    // min+c estimates that overtake and eventually evict it (verified
    // here: the sub-ceiling top tokens are genuinely gone, so the
    // condition in the scaladoc is load-bearing, not decorative).
    val heavy = Seq("h0" -> 1000, "h1" -> 900, "h2" -> 800)
    val light = (0 until 27).map(i => f"t$i%02d" -> 10)
    val occurrences = (heavy ++ light).flatMap { case (t, c) => Seq.fill(c)(t) }
    val n = occurrences.size.toLong
    val cap = 8
    val syn = foldBatches(Seq(occurrences), cap)
    heavy.foreach { case (t, c) =>
      assert(c * cap > n, s"fixture broken: $t does not clear N/cap")
      assert(syn(t) === ((c.toLong, 0L)), s"$t not exact/err=0")
    }
    // and the flip side: sub-ceiling tokens got churned out by
    // evict-inserts despite having been inserted early
    assert(light.count { case (t, _) => syn.contains(t) } < light.size)
    assert(syn.size === cap)
    assert(syn.values.map(_._1).sum === n)
  }
}
