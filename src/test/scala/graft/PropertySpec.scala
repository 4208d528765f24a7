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

/** Model-based properties for this round's selection/dedup operators:
  * each checks the distributed result against a sequential Scala replay
  * of the documented rule over random small corpora (Spark evaluation
  * sampled — bounded case counts, as above).
  */
class SelectionPropertySpec extends SparkSpec {

  private def check(prop: org.scalacheck.Prop, cases: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hashValue(id: Long): Long =
    java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16)

  test("dedupParagraphs equals the sequential keep-first replay") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val lineGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val docGen = Gen.listOfN(4, Gen.listOf(lineGen).map(_.take(4)))
    check(Prop.forAllNoShrink(docGen) { docs =>
      val rows = docs.zipWithIndex.map { case (ls, i) => ((i + 1).toLong, ls) }
      val got = graft.functions.TextAnalysis.dedupParagraphs(
          rows.toDF("doc_id", "lines"), "doc_id", "lines")
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      graft.CacheRegistry.releaseAll()
      // sequential replay: first (doc, pos) occurrence of each line wins
      val seen = scala.collection.mutable.Set[String]()
      val want = rows.map { case (id, ls) =>
        id -> ls.filter(l => seen.add(l)).mkString("\n")
      }.toMap
      got == want
    }, cases = 10)
  }

  test("stratifiedQuota equals first-k by (md5, id) within each stratum") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val rowsGen = Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(1L, 60L)
      dom <- Gen.oneOf("a", "b", "c")
    } yield (id, dom)).map(_.distinctBy(_._1))
    val quotaGen = Gen.chooseNum(1, 5)
    check(Prop.forAllNoShrink(rowsGen, quotaGen) { (rows, q) =>
      val got = graft.functions.Sampling.stratifiedQuota(
          rows.toDF("id", "dom"), "id", "dom", Map("a" -> q), default = 2)
        .collect().map(_.getLong(0)).toSet
      val want = rows.groupBy(_._2).flatMap { case (dom, g) =>
        val k = if (dom == "a") q else 2
        g.map(_._1).sortBy(id => (hashValue(id), id)).take(k)
      }.toSet
      got == want
    }, cases = 15)
  }

  test("percentileCalibrate equals the strictly-below model on random scores") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val scoresGen = Gen.nonEmptyListOf(Gen.chooseNum(0, 9).map(_ / 10.0))
    check(Prop.forAllNoShrink(scoresGen) { ss =>
      val rows = ss.zipWithIndex.map { case (s, i) => ((i + 1).toLong, s) }
      val got = graft.functions.Sampling.percentileCalibrate(
          rows.toDF("id", "score"), "score")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val n = rows.size
      val want = rows.map { case (id, s) =>
        val below = rows.count(_._2 < s)
        id -> (if (n == 1) 0.0
               else BigDecimal(below.toDouble / (n - 1))
                 .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toMap
      got == want
    }, cases = 15)
  }

  test("trailingAgg equals the naive quadratic window model") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val rowsGen = Gen.nonEmptyListOf(for {
      t <- Gen.chooseNum(0L, 100L)
      v <- Gen.chooseNum(0, 50).map(_ / 10.0)
    } yield (t, v)).map(_.zipWithIndex.map { case ((t, v), i) =>
      (1L, (i + 1).toLong, t, v) })
    check(Prop.forAllNoShrink(rowsGen) { rows =>
      val got = graft.ops.Resample.trailingAgg(
          rows.toDF("u", "eid", "t", "v"), Seq("u"), "t", "v", windowNs = 30L)
        .collect().map(r => r.getLong(1) -> ((r.getLong(4), r.getDouble(5)))).toMap
      val want = rows.map { case (_, eid, t, _) =>
        val in = rows.filter(r => r._3 >= t - 30L && r._3 <= t)
        val sum = in.map(r => math.round(r._4 * 1e6)).sum
        eid -> ((in.size.toLong,
          BigDecimal(sum.toDouble / 1e6)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }.toMap
      got == want
    }, cases = 15)
  }
}

/** Model-based property for the stupid-backoff chain: random small
  * train/score corpora from a tiny vocabulary, the distributed result
  * compared against a sequential Scala replay of the exact documented
  * rule (censuses, α-backoff association, 1e-6 grid terms).
  */
class BackoffPropertySpec extends SparkSpec {

  test("backoffLogProb equals the sequential replay on random corpora") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.chooseNum(3, 7).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpusGen = for {
      train <- Gen.listOfN(3, doc)
      score <- Gen.listOfN(3, doc)
    } yield (train, score)
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAllNoShrink(corpusGen) { case (train, score) =>
        val trainDf = train.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
          .toDF("doc_id", "text")
        val scoreDf = score.zipWithIndex.map { case (t, i) => ((i + 101).toLong, t) }
          .toDF("doc_id", "text")
        val got = graft.functions.TextAnalysis
          .backoffLogProb(trainDf, scoreDf, "doc_id", "text")
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        graft.CacheRegistry.releaseAll()
        // sequential replay
        def grams(ws: Seq[String], n: Int) = ws.sliding(n).filter(_.size == n)
          .map(_.mkString(" ")).toSeq
        val tws = train.map(_.split(" ").toSeq)
        def census(n: Int) = tws.flatMap(grams(_, n))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val (c1, c2, c3) = (census(1), census(2), census(3))
        val (nTot, v) = (c1.values.sum, c1.size.toLong)
        def s(w1: String, w2: String, w3: String): Double = {
          val tri = s"$w1 $w2 $w3"; val ctx = s"$w1 $w2"; val bi = s"$w2 $w3"
          if (c3.contains(tri)) c3(tri).toDouble / c2(ctx)
          else 0.4 * (if (c2.contains(bi)) c2(bi).toDouble / c1(w2)
                      else 0.4 * (c1.getOrElse(w3, 0L) + 1) / (nTot + v).toDouble)
        }
        val want = score.zipWithIndex.flatMap { case (t, i) =>
          val ws = t.split(" ").toSeq
          if (ws.size < 3) None else {
            // group by distinct trigram first: the operator grids
            // round(tf * ln(s) * 1e6) per DISTINCT trigram, which is not
            // tf * round(ln(s) * 1e6) when tf > 1
            val occ = ws.sliding(3).filter(_.size == 3).toSeq
            val byTri = occ.groupBy(identity).view.mapValues(_.size.toLong)
            val terms = byTri.map { case (g, tf) =>
              BigDecimal(tf * math.log(s(g(0), g(1), g(2))) * 1e6)
                .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            }.toSeq
            Some((i + 101).toLong -> ((occ.size.toLong,
              BigDecimal(terms.sum.toDouble / 1e6 / occ.size)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
          }
        }.toMap
        got == want
      })
    assert(res.passed, res.status.toString)
  }
}

/** Model-based properties for the round-10 embedding operators: each
  * distributed result is replayed against a driver-side model using the
  * SAME arithmetic (left-to-right fold dot products, normalize-then-dot),
  * with a 1e-9 dead band around every threshold so FP summation-order
  * differences (the centroid avg's partial-agg order is partition-luck)
  * can never flip a comparison into a spurious failure.
  */
class VectorPropertySpec extends SparkSpec {

  import org.scalacheck.{Gen, Prop}

  private def check(prop: Prop, cases: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private val Dim = 3
  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(Dim, Gen.chooseNum(-5, 5)).map(_.map(_.toFloat).toArray)
      .suchThat(v => v.exists(_ != 0f))

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    def n(x: Array[Float]) = math.sqrt(x.map(e => e.toDouble * e).sum)
    val (na, nb) = (n(a), n(b))
    a.zip(b).map { case (x, y) => (x / na) * (y / nb) }.sum
  }

  test("semanticDecontaminate equals the naive pairwise model off the dead band") {
    import spark.implicits._
    val tau = 0.35
    val caseGen = for {
      train <- Gen.listOfN(8, vecGen)
      bench <- Gen.nonEmptyListOf(vecGen).map(_.take(4))
    } yield (train, bench)
    check(Prop.forAllNoShrink(caseGen) { case (train, bench) =>
      val allCos = for (t <- train; b <- bench) yield cos(t, b)
      if (allCos.exists(c => math.abs(c - tau) < 1e-9)) true // dead band
      else {
        val trainDf = train.zipWithIndex
          .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
        val benchDf = bench.zipWithIndex
          .map { case (v, i) => (100L + i, v) }.toDF("vec_id", "embedding")
        val got = graft.functions.VectorOps.semanticDecontaminate(
            trainDf, benchDf, "vec_id", "embedding", tau)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = train.zipWithIndex.flatMap { case (t, i) =>
          val hits = bench.count(b => cos(t, b) >= tau)
          if (hits > 0) Some(i.toLong -> hits.toLong) else None
        }.toMap
        got == want
      }
    }, cases = 10)
  }

  test("centroidOutliers equals the naive centroid model off the dead band") {
    import spark.implicits._
    val caseGen = Gen.listOfN(10,
      for { v <- vecGen; l <- Gen.chooseNum(0, 2) } yield (v, l))
    check(Prop.forAllNoShrink(caseGen) { rows =>
      val cents = rows.groupBy(_._2).view.mapValues { vs =>
        (0 until Dim).map(d => vs.map(_._1(d).toDouble).sum / vs.size).toArray
      }.toMap
      def cosd(a: Array[Float], c: Array[Double]): Double = {
        val na = math.sqrt(a.map(e => e.toDouble * e).sum)
        val nc = math.sqrt(c.map(e => e * e).sum)
        if (na == 0 || nc == 0) Double.NaN
        else a.zip(c).map { case (x, y) => x * y }.sum / (na * nc)
      }
      val scores = rows.zipWithIndex.map { case ((v, l), i) =>
        (i.toLong, l, cosd(v, cents(l))) }
      if (scores.exists { case (_, _, c) => c.isNaN || math.abs(c) < 1e-9 }) true
      else {
        val df = rows.zipWithIndex
          .map { case ((v, l), i) => (i.toLong, v, l) }
          .toDF("vec_id", "embedding", "label")
        val got = graft.functions.VectorOps.centroidOutliers(
            df, "vec_id", "embedding", "label", 0.0)
          .collect().map(_.getLong(0)).toSet
        val want = scores.collect { case (id, _, c) if c < 0.0 => id }.toSet
        got == want
      }
    }, cases = 10)
  }

  test("ivfAssignTag equals the naive argmax model off the tie band") {
    import spark.implicits._
    val caseGen = for {
      vecs <- Gen.listOfN(8, vecGen)
      cents <- Gen.listOfN(4, vecGen)
    } yield (vecs, cents)
    check(Prop.forAllNoShrink(caseGen) { case (vecs, cents) =>
      val scored = vecs.map(v => cents.map(c => cos(v, c)))
      // skip when the top two candidates are within the FP band (the
      // tie-to-smallest-cell rule is pinned separately by DocStreamSpec)
      val ambiguous = scored.exists { cs =>
        val sorted = cs.sorted.reverse
        sorted.size > 1 && (sorted(0) - sorted(1)) < 1e-9
      }
      if (ambiguous) true
      else {
        val df = vecs.zipWithIndex
          .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
        val got = graft.streaming.DocStream.ivfAssignTag(
            df, cents.map(_.map(_.toDouble).toSeq), "embedding", "cell")
          .select("vec_id", "cell")
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        val want = scored.zipWithIndex.map { case (cs, i) =>
          i.toLong -> cs.indexOf(cs.max) }.toMap
        got == want
      }
    }, cases = 10)
  }
}

class SketchPropertySpec extends SparkSpec {

  import org.scalacheck.{Gen, Prop}
  import graft.functions.{Sampling, Sketches}

  test("graft_cms equals the closed-form census on random hashes and dims") {
    import spark.implicits._
    val caseGen = for {
      depth <- Gen.chooseNum(1, 6)
      width <- Gen.oneOf(2, 7, 32, 257)
      // 60-bit non-negative hashes incl. boundary values
      hs <- Gen.nonEmptyListOf(Gen.oneOf(
        Gen.chooseNum(0L, (1L << 60) - 1), Gen.const(0L),
        Gen.const((1L << 60) - 1)))
    } yield (depth, width, hs)
    val cp = graft.plans.CmsSketch.P
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAllNoShrink(caseGen) { case (depth, width, hs) =>
        val want = {
          val buf = Array.fill(depth * width)(0L)
          for (h <- hs; r <- 0 until depth) {
            val h1 = h & cp; val h2 = 1L + ((h >>> 31) & cp)
            buf(r * width + (((h1 + r * h2) % cp) % width).toInt) += 1L
          }
          buf.toSeq
        }
        val df = hs.toDF("h")
        val got = df.repartition(3)
          .agg(Sketches.cmsAgg(df, col("h"), depth, width).as("s"))
          .select(col("s")).head().getSeq[Long](0)
        got == want
      })
    assert(res.passed, res.status.toString)
  }

  test("quantilesByDomain equals the sorted-scan model on random censuses") {
    import spark.implicits._
    // tiny value grid forces heavy ties; two domains exercise grouping
    val rowsGen = Gen.nonEmptyListOf(for {
      dom <- Gen.oneOf("a", "b")
      v <- Gen.chooseNum(0, 4)
    } yield (dom, v.toDouble))
    val pcts = Seq(25, 50, 75, 90, 100)
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAllNoShrink(rowsGen) { rows =>
        val got = Sampling.quantilesByDomain(rows.toDF("dom", "v"), "dom", "v", pcts)
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), pcts.indices.map(i => r.getDouble(2 + i)))).toMap
        val want = rows.groupBy(_._1).map { case (dom, g) =>
          val sorted = g.map(_._2).sorted
          dom -> ((sorted.size.toLong, pcts.map(p =>
            sorted(sorted.indices.find(i => (i + 1) * 100 >= sorted.size * p).get))))
        }
        got == want
      })
    assert(res.passed, res.status.toString)
  }
}

class SkylinePropertySpec extends SparkSpec {

  import org.scalacheck.{Gen, Prop}

  test("skyline2D equals the naive O(n^2) dominance filter on random points") {
    import spark.implicits._
    // small coordinate grids force heavy x/y ties, the fiddly case
    val ptsGen = Gen.nonEmptyListOf(for {
      x <- Gen.chooseNum(0, 6)
      y <- Gen.chooseNum(0L, 6L)
    } yield (x.toDouble, y))
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAllNoShrink(ptsGen) { pts =>
        val rows = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        val got = graft.ops.Skyline.skyline2D(rows.toDF("id", "x", "y"), "x", "y")
          .select("id").collect().map(_.getLong(0)).toSet
        val want = rows.filter { case (_, x, y) =>
          !pts.exists(p => p._1 >= x && p._2 >= y && (p._1 > x || p._2 > y))
        }.map(_._1).toSet
        got == want
      })
    assert(res.passed, res.status.toString)
  }
}
