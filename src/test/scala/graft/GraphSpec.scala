package graft

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
