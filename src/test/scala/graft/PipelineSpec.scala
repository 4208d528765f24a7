package graft

import org.apache.spark.sql.functions._

import graft.functions._

class TextAnalysisSpec extends SparkSpec {

  test("token and stopword accounting") {
    import spark.implicits._
    val df = Seq("the cat sat on the mat").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.stopwordRatio(col("text")),
      TextAnalysis.avgTokenLen(col("text"))).head()
    assert(r.getInt(0) === 6)
    assert(r.getDouble(1) === 3.0 / 6.0) // the, on, the
    assert(math.abs(r.getDouble(2) - 17.0 / 6.0) < 1e-12)
  }

  test("subword count segments letter/digit/punct runs") {
    import spark.implicits._
    val df = Seq("abc123 def!").toDF("text")
    // runs: abc, 123, def, !
    assert(df.select(TextAnalysis.subwordCount(col("text"))).head().getInt(0) === 4)
  }

  test("fingerprint is stable and case-insensitive") {
    import spark.implicits._
    val df = Seq(("Hello World", "hello world")).toDF("a", "b")
    val r = df.select(TextAnalysis.fingerprint(col("a")),
      TextAnalysis.fingerprint(col("b"))).head()
    assert(r.getLong(0) === r.getLong(1))
  }

  test("quality score stays in [0,1]") {
    import spark.implicits._
    val df = Seq("the of and to in a", "xxxxx", "!!!!!").toDF("text")
    val vals = df.select(TextAnalysis.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(vals.forall(v => v >= 0.0 && v <= 1.0))
  }
}

class MinHashLSHSpec extends SparkSpec {

  test("identical docs collide in every band and get jaccard 1.0") {
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq((1L, text), (2L, text), (3L, "totally different words entirely here now"))
      .toDF("doc_id", "text")
    val pairs = MinHashLSH.nearDupPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("near-identical docs are candidates with high jaccard") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val variant = base + " extra"
    val df = Seq((1L, base), (2L, variant)).toDF("doc_id", "text")
    val pairs = MinHashLSH.nearDupPairs(df, "doc_id", "text").collect()
    assert(pairs.length === 1)
    assert(pairs.head.getDouble(2) > 0.9)
  }

  test("shingles: docs shorter than n emit nothing") {
    import spark.implicits._
    val df = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
    val sh = MinHashLSH.shingles(df, "doc_id", "text", 3)
    assert(sh.where(col("doc_id") === 1).count() === 0)
    assert(sh.where(col("doc_id") === 2).count() === 2)
  }
}

class SimHashSpec extends SparkSpec {

  test("identical docs share a sketch; hamming detects similarity ordering") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val aNear = a + " tail"
    val far = "completely unrelated vocabulary covering other topics entirely now ok"
    val df = Seq((1L, a), (2L, a), (3L, aNear), (4L, far)).toDF("doc_id", "text")
    val sk = SimHash.simhash(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(1L) === sk(2L))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(sk(1L), sk(3L)) < ham(sk(1L), sk(4L)))
  }
}

class VectorOpsSpec extends SparkSpec {

  test("cosine matches hand computation") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val got = df.select(VectorOps.cosine(col("a").cast("array<double>"),
      col("b").cast("array<double>"))).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 0.0) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
  }

  test("kNN brute force returns k nearest, excluding self, matching naive") {
    import spark.implicits._
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(4)(d => math.sin(i * 2.0 + d).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = VectorOps.knnBruteForce(df.where(col("vec_id") === 0), df, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val naive = vecs.tail.map { case (id, v) => id -> cos(vecs.head._2, v) }
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    assert(got.keySet === naive)
  }

  test("blocked near-dup pairs respect the threshold and the block") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.99f, 0.01f), 0),
      (3L, Array(1.0f, 0.0f), 1), // same vector, different block -> no pair
      (4L, Array(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = VectorOps.nearDupPairs(df, "vec_id", "embedding", "label", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }
}
