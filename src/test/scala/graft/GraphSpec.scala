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
  }
}
