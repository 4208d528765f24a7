package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll

import graft.functions.GraphOps

class GraphOpsSpec extends SparkSpec {

  private def ranks(edges: Seq[(Long, Long)], iters: Int,
                    checkpointEvery: Int = 8): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.pageRank(edges.toDF("src", "dst"), "src", "dst", iters,
        checkpointEvery)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pagerank: symmetric 2-cycle is a fixpoint at 1/2") {
    // N=2, deg=1: r' = 15e7 div 2 + (85 * 5e8) div 100 = 5e8 exactly.
    for (it <- Seq(1, 3, 7)) {
      val r = ranks(Seq((1L, 2L), (2L, 1L)), it)
      assert(r === Map(1L -> 500000000L, 2L -> 500000000L), s"iters=$it")
    }
  }

  test("pagerank: directed star concentrates rank on the hub (exact)") {
    // a=1 hub: 1->2, 1->3, 2->1, 3->1. N=3, deg(1)=2, deg(2)=deg(3)=1.
    // r0 = 333333333; s(1) = 2*333333333, s(leaf) = 333333333 div 2.
    val r = ranks(Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)), 1)
    assert(r(1L) === 50000000L + 85L * 666666666L / 100L)
    assert(r(2L) === 50000000L + 85L * 166666666L / 100L)
    assert(r(2L) === r(3L)) // symmetric leaves stay tied
    assert(r(1L) > r(2L))
  }

  test("pagerank: in-degree-0 node falls to the teleport base") {
    val r = ranks(Seq((1L, 2L)), 1) // N=2: base = 15e7 div 2
    assert(r(1L) === 75000000L)
    assert(r(2L) === 75000000L + 85L * 500000000L / 100L)
  }

  test("pagerank: checkpoint cadence does not change the result") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 2L), (4L, 1L),
      (1L, 4L))
    val a = ranks(edges, 5, checkpointEvery = 1)
    val b = ranks(edges, 5, checkpointEvery = 8)
    assert(a === b)
  }

  test("pagerank: total mass never exceeds the 1e9 grid") {
    val edges = (1L to 30L).flatMap(i => Seq((i, i % 30 + 1), (i % 30 + 1, i)))
    val r = ranks(edges, 3)
    assert(r.size === 30)
    val total = r.values.sum
    assert(total <= 1000000000L && total > 900000000L) // div-truncation only
  }

  private def ranksW(edges: Seq[(Long, Long, Long)],
                     iters: Int): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", iters,
        weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pagerank weighted: mass splits by weight (exact)") {
    // 1 -> 2 (w 3), 1 -> 3 (w 1), 2 -> 1, 3 -> 1. N=3, W(1)=4.
    val r = ranksW(Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L),
      (3L, 1L, 1L)), 1)
    assert(r(1L) === 50000000L + 85L * (333333333L + 333333333L) / 100L)
    assert(r(2L) === 50000000L + 85L * (333333333L * 3 / 4) / 100L)
    assert(r(3L) === 50000000L + 85L * (333333333L / 4) / 100L)
    assert(r(2L) > r(3L)) // the heavier edge pulls more centrality
  }

  test("pagerank weighted: unit weights equal the uniform split bit-for-bit") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 2L), (4L, 1L), (1L, 4L))
    assert(ranksW(edges.map(e => (e._1, e._2, 1L)), 3) === ranks(edges, 3))
  }

  test("pagerank weighted equals the sequential replay on random weights") {
    val edgeGen = Gen.nonEmptyListOf(for {
      u <- Gen.chooseNum(1L, 6L); v <- Gen.chooseNum(1L, 6L)
      w <- Gen.chooseNum(1L, 5L)
    } yield (u, v, w))
    def model(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val n = nodes.size
      val tw = edges.groupBy(_._1).map { case (k, g) => k -> g.map(_._3).sum }
      var r = nodes.map(_ -> 1000000000L / n).toMap
      for (_ <- 1 to iters) {
        val s = edges.groupBy(_._2).map { case (v, es) =>
          v -> es.map { case (u, _, w) => r(u) * w / tw(u) }.sum }
        r = nodes.map(v =>
          v -> (150000000L / n + 85L * s.getOrElse(v, 0L) / 100L)).toMap
      }
      r
    }
    checkProp(Prop.forAllNoShrink(edgeGen, Gen.chooseNum(1, 3)) {
      (edges, iters) => ranksW(edges, iters) == model(edges, iters)
    })
  }

  private def tri(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val r = GraphOps.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("triangles: one triangle, gcc = 1") {
    // 3 nodes deg 2 each: 1 wedge per node, all closed
    assert(tri(Seq((1L, 2L), (2L, 3L), (1L, 3L))) === (3L, 3L, 1L, 3L, 1000000L))
  }

  test("triangles: open path has zero triangles, one wedge") {
    assert(tri(Seq((1L, 2L), (2L, 3L))) === (3L, 2L, 0L, 1L, 0L))
  }

  test("triangles: reversed and duplicate edges normalize away") {
    // (2,1) and (1,2) are the same undirected edge; self-loop dropped
    val got = tri(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L)))
    assert(got === (3L, 3L, 1L, 3L, 1000000L))
  }

  test("triangles: K4 closes every wedge") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    // 4 triangles, deg 3 each -> 3 wedges per node = 12, gcc = 12/12
    assert(tri(k4) === (4L, 6L, 4L, 12L, 1000000L))
  }

  private def checkProp(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  // model-based: the distributed integer recurrence vs a sequential Scala
  // replay of the SAME arithmetic over random multigraphs (self-loops and
  // duplicate edges included — the operator takes edges as given)
  test("pagerank equals the sequential integer-recurrence replay") {
    val edgeGen = Gen.nonEmptyListOf(for {
      u <- Gen.chooseNum(1L, 7L); v <- Gen.chooseNum(1L, 7L)
    } yield (u, v))
    def model(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val n = nodes.size
      val deg = edges.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
      var r = nodes.map(_ -> 1000000000L / n).toMap
      for (_ <- 1 to iters) {
        val s = edges.groupBy(_._2).map { case (v, es) =>
          v -> es.map { case (u, _) => r(u) / deg(u) }.sum }
        r = nodes.map(v =>
          v -> (150000000L / n + 85L * s.getOrElse(v, 0L) / 100L)).toMap
      }
      r
    }
    checkProp(Prop.forAllNoShrink(edgeGen, Gen.chooseNum(1, 4)) {
      (edges, iters) => ranks(edges, iters) == model(edges, iters)
    })
  }

  test("triangle census equals brute-force enumeration on random graphs") {
    val edgeGen = Gen.nonEmptyListOf(for {
      u <- Gen.chooseNum(1L, 8L); v <- Gen.chooseNum(1L, 8L)
    } yield (u, v))
    checkProp(Prop.forAllNoShrink(edgeGen) { edges =>
      val norm = edges.map { case (u, v) => (math.min(u, v), math.max(u, v)) }
        .filter(e => e._1 != e._2).distinct.toSet
      if (norm.isEmpty) true // operator requires >= 1 surviving edge rows
      else {
        val nodes = norm.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val t = (for {
          a <- nodes; b <- nodes if a < b && norm((a, b))
          c <- nodes if b < c && norm((b, c)) && norm((a, c))
        } yield 1).size.toLong
        val deg = nodes.map(v =>
          norm.count(e => e._1 == v || e._2 == v).toLong)
        val wedges = deg.map(d => d * (d - 1) / 2).sum
        val gcc = if (wedges > 0) 3 * t * 1000000L / wedges else 0L
        tri(norm.toSeq) ==
          ((nodes.size.toLong, norm.size.toLong, t, wedges, gcc))
      }
    })
  }

  private def communities(edges: Seq[(Long, Long)],
                          iters: Int): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.labelPropagation(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("label propagation: a clique collapses onto its smallest id") {
    val sym = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
    assert(communities(sym, 3) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("label propagation: disjoint cliques get disjoint communities") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val got = communities(clique(Seq(1L, 2L, 3L)) ++ clique(Seq(7L, 8L, 9L)), 3)
    assert(got.filterKeys(_ <= 3L).values.toSet === Set(1L))
    assert(got.filterKeys(_ >= 7L).values.toSet === Set(7L))
  }

  test("label propagation equals the sequential synchronous replay") {
    val edgeGen = Gen.nonEmptyListOf(for {
      u <- Gen.chooseNum(1L, 7L); v <- Gen.chooseNum(1L, 7L)
    } yield (u, v))
    def model(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var lab = nodes.map(v => v -> v).toMap
      for (_ <- 1 to iters) {
        val next = nodes.map { v =>
          val votes = edges.filter(_._2 == v).map(e => lab(e._1))
            .groupBy(identity).map { case (l, g) => (l, g.size) }
          v -> (if (votes.isEmpty) lab(v)
                else votes.toSeq.maxBy { case (l, c) => (c, -l) }._1)
        }.toMap
        lab = next
      }
      lab
    }
    checkProp(Prop.forAllNoShrink(edgeGen, Gen.chooseNum(1, 4)) {
      (edges, iters) => communities(edges, iters) == model(edges, iters)
    })
  }

  private def ranksSeeded(edges: Seq[(Long, Long)], seeds: Seq[Long],
                          iters: Int): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.pageRank(edges.toDF("src", "dst"), "src", "dst", iters,
        seeds = Some(seeds.toDF("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("seeded pagerank: 2-cycle with one seed (exact)") {
    // ns=1: r0 = (1e9, 0); iter 1: r(1) = 15e7 + 0, r(2) = 0 + 85e7
    val r = ranksSeeded(Seq((1L, 2L), (2L, 1L)), Seq(1L), 1)
    assert(r === Map(1L -> 150000000L, 2L -> 850000000L))
  }

  test("seeded pagerank: seeding every node equals the uniform recurrence") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 2L), (4L, 1L), (1L, 4L))
    assert(ranksSeeded(edges, Seq(1L, 2L, 3L, 4L), 3) === ranks(edges, 3))
  }

  test("seeded pagerank: seed ids outside the graph are ignored") {
    val edges = Seq((1L, 2L), (2L, 1L))
    assert(ranksSeeded(edges, Seq(1L, 99L), 1) ===
      ranksSeeded(edges, Seq(1L), 1))
  }

  test("seeded pagerank equals the sequential replay on random seed sets") {
    val caseGen = for {
      edges <- Gen.nonEmptyListOf(for {
        u <- Gen.chooseNum(1L, 6L); v <- Gen.chooseNum(1L, 6L)
      } yield (u, v))
      seeds <- Gen.atLeastOne(edges.flatMap(e => Seq(e._1, e._2)).distinct)
    } yield (edges, seeds.toList)
    def model(edges: Seq[(Long, Long)], seeds: Seq[Long],
              iters: Int): Map[Long, Long] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val sd = seeds.toSet.intersect(nodes.toSet)
      val ns = sd.size
      val deg = edges.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
      var r = nodes.map(v => v -> (if (sd(v)) 1000000000L / ns else 0L)).toMap
      for (_ <- 1 to iters) {
        val s = edges.groupBy(_._2).map { case (v, es) =>
          v -> es.map { case (u, _) => r(u) / deg(u) }.sum }
        r = nodes.map(v => v -> ((if (sd(v)) 150000000L / ns else 0L) +
          85L * s.getOrElse(v, 0L) / 100L)).toMap
      }
      r
    }
    checkProp(Prop.forAllNoShrink(caseGen, Gen.chooseNum(1, 3)) {
      case ((edges, seeds), iters) =>
        ranksSeeded(edges, seeds, iters) == model(edges, seeds, iters)
    })
  }

  private def core(edges: Seq[(Long, Long)], k: Int,
                   rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    val sym = df.union(df.select(df("dst"), df("src")))
    GraphOps.kCore(sym, "src", "dst", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kcore: triangle survives k=2, tail peels off") {
    val got = core(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), 2, 3)
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kcore: k=3 cascade empties a triangle-plus-tail graph") {
    // deg(3)=3 survives round 1 alone, then loses all neighbors
    assert(core(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), 3, 3) === Map())
  }

  test("kcore: fixed rounds expose the peel frontier on a path") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // round 1 peels the endpoints, round 2 peels 2 and 4, round 3 starves 3
    assert(core(path, 2, 2) === Map(3L -> 2L))
    assert(core(path, 2, 3) === Map())
  }

  test("kcore: K4 is its own 3-core") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(core(k4, 3, 3) === (1L to 4L).map(_ -> 3L).toMap)
  }

  test("kcore: rounds beyond the fixpoint change nothing (spec fixture)") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 4L))
    assert(core(edges, 2, 3) === core(edges, 2, 4))
  }

  test("kcore equals the sequential peel replay on random graphs") {
    val edgeGen = Gen.nonEmptyListOf(for {
      u <- Gen.chooseNum(1L, 8L); v <- Gen.chooseNum(1L, 8L)
    } yield (u, v))
    def model(edges: Seq[(Long, Long)], k: Int,
              rounds: Int): Map[Long, Long] = {
      // mirror the operator's intake: symmetrized, self-loops out, distinct
      val e = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
        .filter(p => p._1 != p._2).distinct
      var surv = e.map(_._1).distinct.toSet
      var deg = Map.empty[Long, Long]
      for (_ <- 1 to rounds) {
        val r = e.filter(p => surv(p._1) && surv(p._2))
        deg = r.groupBy(_._1).map { case (n, g) => n -> g.size.toLong }
        surv = deg.filter(_._2 >= k).keySet
      }
      deg.filter(_._2 >= k)
    }
    checkProp(Prop.forAllNoShrink(edgeGen, Gen.chooseNum(1, 3),
        Gen.chooseNum(1, 4)) { (edges, k, rounds) =>
      val e = edges.filter(p => p._1 != p._2)
      e.isEmpty || core(e, k, rounds) == model(e, k, rounds)
    })
  }

  private def mod(edges: Seq[(Long, Long)],
                  assign: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val r = GraphOps.modularity(edges.toDF("src", "dst"), "src", "dst",
      assign.toDF("id", "comm"), "id", "comm").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("modularity: one community scores exactly zero") {
    // L=m and D=2m make the two grid terms equal: 1e6 - 1e6
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(mod(tri, Seq((1L, 9L), (2L, 9L), (3L, 9L))) ===
      ((3L, 3L, 1L, 3L, 0L)))
  }

  test("modularity: two disjoint cliques with own labels (exact)") {
    // per community: add = 3e6 div 6, sub = 36e6 div 144 -> Q = 2*250000
    val two = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L))
    val asg = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L), (9L, 7L))
    assert(mod(two, asg) === ((6L, 6L, 2L, 6L, 500000L)))
  }

  test("modularity: unassigned nodes become singleton communities") {
    // 1-2 split into singletons: no intra mass, sub = 1e6 div 4 each
    assert(mod(Seq((1L, 2L)), Seq.empty) === ((2L, 1L, 2L, 0L, -500000L)))
  }

  test("modularity: one total row on empty edges") {
    assert(mod(Seq.empty, Seq((1L, 1L))) === ((0L, 0L, 0L, 0L, 0L)))
  }

  test("modularity equals the sequential integer replay on random partitions") {
    val caseGen = for {
      edges <- Gen.nonEmptyListOf(for {
        u <- Gen.chooseNum(1L, 8L); v <- Gen.chooseNum(1L, 8L)
      } yield (u, v))
      labels <- Gen.listOfN(8, Gen.chooseNum(1L, 3L))
    } yield (edges, (1L to 8L).zip(labels).toList)
    def model(edges: Seq[(Long, Long)],
              assign: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
      val e = edges.map { case (u, v) => (math.min(u, v), math.max(u, v)) }
        .filter(p => p._1 != p._2).distinct
      val m = e.size.toLong
      val cm = assign.toMap
      def c(v: Long) = cm.getOrElse(v, v)
      val ends = e.flatMap(p => Seq(c(p._1), c(p._2)))
      val dc = ends.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      val lc = e.filter(p => c(p._1) == c(p._2)).groupBy(p => c(p._1))
        .map { case (k, g) => k -> g.size.toLong }
      val q = dc.keys.toSeq.map { k =>
        lc.getOrElse(k, 0L) * 1000000L / m -
          (BigInt(dc(k)) * dc(k) * 1000000 / (BigInt(4) * m * m)).toLong
      }.sum
      val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong
      (nodes, m, dc.size.toLong, lc.values.sum, q)
    }
    checkProp(Prop.forAllNoShrink(caseGen) { case (edges, assign) =>
      val e = edges.filter(p => p._1 != p._2)
      e.isEmpty || mod(e, assign) == model(e, assign)
    })
  }

  test("plans: edge-sized work is always an equijoin, never a cross product") {
    import spark.implicits._
    val edges = (1L to 50L).map(i => (i, i % 50 + 1)).toDF("src", "dst")
    // the only nested-loop joins allowed are the broadcast 1-row scalar
    // frames (N, totals) — a cross product over edges would be O(|E|^2)
    val pr = GraphOps.pageRank(edges, "src", "dst", iters = 2)
      .queryExecution.executedPlan.toString
    assert(!pr.contains("CartesianProduct"), pr)
    val ts = GraphOps.triangleStats(edges, "src", "dst")
      .queryExecution.executedPlan.toString
    assert(!ts.contains("CartesianProduct"), ts)
    assert(ts.contains("Join"), ts) // triangle closure is a real equijoin
    // k-core restriction is two semi joins per round — never a cross
    // product, and the seed flag in seeded pagerank rides a broadcast
    val kc = GraphOps.kCore(edges, "src", "dst", k = 2, rounds = 2)
      .queryExecution.executedPlan.toString
    assert(!kc.contains("CartesianProduct"), kc)
    import spark.implicits._
    val ps = GraphOps.pageRank(edges, "src", "dst", iters = 2,
        seeds = Some(Seq(1L, 2L).toDF("id")))
      .queryExecution.executedPlan.toString
    assert(!ps.contains("CartesianProduct"), ps)
  }

  private def assort(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    val sym = df.union(df.select(df("dst"), df("src")))
    val r = GraphOps.degreeAssortativity(sym, "src", "dst").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("assortativity: star is exactly -1, clique union is exactly +1") {
    // K1,3: every edge joins deg-3 hub to deg-1 leaf -> perfect disassort
    assert(assort(Seq((1L, 2L), (1L, 3L), (1L, 4L))) ===
      ((4L, 6L, 3L, -1000000L)))
    // K3 + K2: within-component degrees equal -> perfect assort
    assert(assort(Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L))) ===
      ((5L, 8L, 2L, 1000000L)))
  }

  test("assortativity: degree-regular graphs report 0, empty edges total") {
    import spark.implicits._
    // single edge: both endpoints deg 1, den = 0 -> the documented 0
    assert(assort(Seq((1L, 2L)))._4 === 0L)
    val none = GraphOps.degreeAssortativity(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst").head()
    assert(none.toSeq === Seq(0L, 0L, 0L, 0L))
  }

  test("assortativity equals the exact BigInt model on random graphs") {
    def model(edges: Seq[(Long, Long)]): Long = {
      val sym = (edges ++ edges.map(_.swap)).filter(p => p._1 != p._2).distinct
      val deg = sym.groupBy(_._1).map { case (k, g) => k -> BigInt(g.size) }
      val m = BigInt(sym.size)
      val sx = sym.map { case (u, _) => deg(u) }.sum
      val sxy = sym.map { case (u, v) => deg(u) * deg(v) }.sum
      val sxx = sym.map { case (u, _) => deg(u) * deg(u) }.sum
      val num = m * sxy - sx * sx
      val den = m * sxx - sx * sx
      if (den <= 0) 0L
      else if (num >= 0) ((num * 1000000) / den).toLong
      else -(((-num) * 1000000) / den).toLong
    }
    val edgesGen = Gen.nonEmptyListOf(for {
      u <- Gen.chooseNum(1L, 7L); v <- Gen.chooseNum(1L, 7L)
    } yield (u, v))
    checkProp(Prop.forAllNoShrink(edgesGen) { edges =>
      val e = edges.filter(p => p._1 != p._2)
      e.isEmpty || assort(e.distinct)._4 == model(e)
    })
  }
}
