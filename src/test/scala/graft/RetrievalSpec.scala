package graft

import graft.functions.Retrieval

class RetrievalSpec extends SparkSpec {

  test("rrf: closed-form fusion, missing list membership contributes 0") {
    import spark.implicits._
    val lex = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val sem = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem), "id", "rank")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getLong(3), r.getInt(4)))
    // 10^6 div 61 = 16393, div 62 = 16129
    assert(got.toSeq === Seq(
      (2L, Some(2L), Some(1L), 16129L + 16393L, 1),
      (1L, Some(1L), None, 16393L, 2),
      (3L, None, Some(2L), 16129L, 3)))
  }

  test("rrf: equal scores break ties by id ascending; topK truncates") {
    import spark.implicits._
    val one = (1L to 9L).map(i => (i, 1)).toDF("id", "rank") // all rank 1
    val got = Retrieval.rrfFuse(Seq("a" -> one), "id", "rank", topK = 4)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(got.toSeq === (1 to 4).map(i => (i.toLong, i)))
  }

  test("rrf: duplicate labels rejected") {
    import spark.implicits._
    val df = Seq((1L, 1)).toDF("id", "rank")
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("a" -> df, "a" -> df), "id", "rank")
    }
  }

  test("rank agreement: identical, inverted, partial and disjoint lists") {
    import spark.implicits._
    def agree(a: Seq[(Long, Int)], b: Seq[(Long, Int)]) = {
      val r = Retrieval.rankAgreement(a.toDF("id", "rank"),
        b.toDF("id", "rank"), "id", "rank").head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val asc = Seq((1L, 1), (2L, 2), (3L, 3))
    assert(agree(asc, asc) === ((3L, 3L, 0L, 1000000L)))
    assert(agree(asc, Seq((1L, 3), (2L, 2), (3L, 1))) ===
      ((3L, 0L, 3L, -1000000L))) // full inversion, exact -1
    // one swapped pair: C=2, D=1, tau = 1e6 div 3
    assert(agree(asc, Seq((1L, 1), (2L, 3), (3L, 2))) ===
      ((3L, 2L, 1L, 333333L)))
    // disjoint id spaces: empty census, tau pinned to 0
    assert(agree(asc, Seq((9L, 1))) === ((0L, 0L, 0L, 0L)))
  }

  test("rrf equals the sequential fusion model on random list sets") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    // each list: a random distinct-id subset in rank order 1..m
    val listGen = Gen.chooseNum(1, 3).flatMap(nl =>
      Gen.listOfN(nl, Gen.someOf(0L to 9L).map(_.toList)
        .suchThat(_.nonEmpty)))
    val prop = Prop.forAllNoShrink(listGen, Gen.chooseNum(1, 6)) {
      (lists, topK) =>
        val ranks = lists.map(_.zipWithIndex
          .map { case (id, i) => id -> (i + 1).toLong }.toMap)
        val ids = ranks.flatMap(_.keys).distinct
        val want = ids.map(id => id -> ranks.map(m =>
            m.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L)).sum)
          .sortBy { case (id, s) => (-s, id) }.take(topK)
          .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }
        val dfs = lists.zipWithIndex.map { case (l, i) =>
          s"l$i" -> l.zipWithIndex.map { case (id, r) => (id, r + 1) }
            .toDF("id", "rank")
        }
        val got = Retrieval.rrfFuse(dfs, "id", "rank", topK = topK)
          .select("id", "rrf_micro", "rk")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .toList
        got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
