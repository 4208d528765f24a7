package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll

import graft.ops.{ArgmaxLatest, ArgsTable, DynamicFilter}

/** ScalaCheck properties for the pure / driver-side operator logic
  * (SURVEY.md §5.1): the dynamic-filter conjunction over arbitrary
  * present/absent argument combinations, list parsing round-trips, and the
  * argmax against a naive model. Spark-side evaluation is sampled (one
  * Dataset per property case would be slow), so the distributed pieces run
  * on a bounded generator while the driver-side pieces get full ScalaCheck
  * coverage.
  */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop,
      params: org.scalacheck.Test.Parameters =
        org.scalacheck.Test.Parameters.default): Unit = {
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  // -------------------------------------------------- ArgsTable round-trip

  private val elemGen: Gen[String] =
    Gen.chooseNum(0, 9999).map(_.toString)

  test("parseList round-trips any rendered (a),(b),(c) list") {
    check(forAll(Gen.listOf(elemGen)) { xs =>
      val rendered = xs.map(x => s"($x)").mkString(",")
      ArgsTable.parseList(rendered) == xs
    })
  }

  test("parseListKeepEmpty preserves positions incl. empty () slots") {
    val slotGen = Gen.oneOf(elemGen, Gen.const(""))
    check(forAll(Gen.nonEmptyListOf(slotGen)) { xs =>
      val rendered = xs.map(x => s"($x)").mkString(",")
      ArgsTable.parseListKeepEmpty(rendered) == xs
    })
  }

  // ------------------------------------------- DynamicFilter conjunction

  test("conjunct over any present/absent pattern equals naive filtering") {
    import spark.implicits._
    val rows = Seq((1, 10L, "a"), (2, 20L, "b"), (3, 10L, "a"), (4, 30L, "c"),
      (5, 20L, "b"), (6, 40L, "a"))
    val df = rows.toDF("id", "v", "s").cache()
    val argGen = for {
      vEq <- Gen.option(Gen.oneOf(10L, 20L, 30L, 40L, 99L))
      sEq <- Gen.option(Gen.oneOf("a", "b", "c", "z"))
      vGe <- Gen.option(Gen.oneOf(10L, 25L, 50L))
    } yield (vEq, sEq, vGe)
    check(Prop.forAllNoShrink(argGen) { case (vEq, sEq, vGe) =>
      val cond = DynamicFilter.conjunct(
        vEq.map(x => col("v") === x),
        sEq.map(x => col("s") === x),
        vGe.map(x => col("v") >= x))
      val got = df.where(cond).select("id").collect().map(_.getInt(0)).toSet
      val want = rows.filter { case (_, v, s) =>
        vEq.forall(_ == v) && sEq.forall(_ == s) && vGe.forall(v >= _)
      }.map(_._1).toSet
      got == want
    }, org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(25))

  }

  // --------------------------------------------------- argmax vs naive

  test("latestRows equals the naive per-key max over random small logs") {
    import spark.implicits._
    val logGen = Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(1, 4)
      ord <- Gen.chooseNum(1L, 50L)
      v <- Gen.chooseNum(0L, 999L)
    } yield (k, ord, v))
    check(Prop.forAllNoShrink(logGen) { log =>
      // one row per (k, ord): ties on the full ordering key are
      // non-deterministic by definition, as in the real delta log
      val rows = log.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val got = ArgmaxLatest.latestRows(
          rows.toDF("k", "ord", "v"), Seq("k"), struct(col("ord")))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = rows.groupBy(_._1).map { case (k, g) =>
        val b = g.maxBy(_._2); k -> (b._2, b._3)
      }
      got == want
    }, org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15))
  }
}
