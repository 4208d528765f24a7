package graft

import org.apache.spark.sql.functions._

import graft.queries.{Backup, MessageReconstruct, SnapshotDump, UpdateHistory}
import graft.functions.{MinHashLSH, TextAnalysis, VectorLSH}

/** Totality on empty inputs: every query family must return a well-formed
  * (possibly empty) result on an empty log/corpus — never throw. Empty
  * partitions are routine at 100 TB (a pruned-out day, a new deployment's
  * empty table); a driver-side head()/first() on nothing must not NPE.
  */
class EmptyInputSpec extends SparkSpec {

  private def emptyLog = Fixtures.instanceField(spark).limit(0)

  test("getMessage on an empty log + empty snapshots = all sentinels") {
    import spark.implicits._
    val emptySnaps = (_: String) =>
      Fixtures.snapshots(spark)("snap_0").limit(0)
    val got = MessageReconstruct.getMessage(
      emptyLog, Fixtures.instanceMessage(spark), Fixtures.uevolField(spark),
      Some(Fixtures.snapshotCatalog(spark)), emptySnaps, 150L)
      .collect()
    assert(got.length === 6) // one -1 sentinel row per catalog field
    assert(got.forall(_.getAs[Double]("value") === -1.0))
  }

  test("snapshot-diff parity on an empty log + empty snapshots = sentinels") {
    val emptySnaps = (_: String) =>
      Fixtures.snapshots(spark)("snap_0").limit(0)
    val got = MessageReconstruct.getMessageSnapshotDiff(
      emptyLog, Fixtures.instanceMessage(spark), Fixtures.uevolField(spark),
      Some(Fixtures.snapshotCatalog(spark)), emptySnaps, 50L)
      .collect()
    assert(got.length === 6)
    assert(got.forall(_.getAs[Double]("value") === -1.0))
  }

  test("updateHistory wide + long on an empty window = the seed row only") {
    import spark.implicits._
    val args = Seq((1, 10, 20, "")).toDF("uevol_field_id", "src_id", "dst_id", "filter")
    val start = Seq((1, 10, 20, 5.0)).toDF("uevol_field_id", "src_id", "dst_id", "value")
    val wide = UpdateHistory.updateHistory(emptyLog, args, start, 100L, 150L).collect()
    assert(wide.length === 1 && wide.head.getAs[Long]("id1_src10_dst20") === 5L)
    val long = UpdateHistory.updateHistoryLong(emptyLog, args, start, 100L, 150L).collect()
    assert(long.length === 1 && long.head.getAs[Long]("value") === 5L)
  }

  test("updateHistory with an empty argument set = empty result") {
    import spark.implicits._
    val noArgs = Seq.empty[(Int, Int, Int, String)]
      .toDF("uevol_field_id", "src_id", "dst_id", "filter")
    val noStart = Seq.empty[(Int, Int, Int, Double)]
      .toDF("uevol_field_id", "src_id", "dst_id", "value")
    assert(UpdateHistory.updateHistoryLong(
      Fixtures.instanceField(spark), noArgs, noStart, 100L, 150L).count() === 0)
  }

  test("compact and dump of an empty log are empty") {
    assert(Backup.compact(emptyLog, Fixtures.instanceMessage(spark),
      Fixtures.uevolField(spark), 112000L).count() === 0)
    assert(SnapshotDump.dump(emptyLog, 100L).count() === 0)
  }

  test("dedup and ANN operators are total on an empty corpus") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(MinHashLSH.nearDupPairs(noDocs, "doc_id", "text").count() === 0)
    assert(MinHashLSH.clusters(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() === 0)
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(VectorLSH.annTopK(noVecs, noVecs, "vec_id", "embedding", 5).count() === 0)
    assert(VectorLSH.nearDupPairs(noVecs, "vec_id", "embedding", 0.5).count() === 0)
  }

  test("round-3 text operators are total on an empty corpus") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.functions.JaccardJoin
      .similarPairs(noDocs, "doc_id", "text", 0.7).count() === 0)
    assert(TextAnalysis.tfidfTopK(noDocs, "doc_id", "text", 3).count() === 0)
    assert(TextAnalysis.chunk(noDocs, "doc_id", "text", 10, 2).count() === 0)
    val someDocs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    // empty reference corpus and empty probe side both yield no tags
    assert(graft.streaming.DocStream.nearDupTag(someDocs, noDocs).count() === 0)
    assert(graft.streaming.DocStream.nearDupTag(noDocs, someDocs).count() === 0)
  }

  test("round-7 operators are total on an empty corpus") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.unigramLogProb(noDocs, "doc_id", "text").count() === 0)
    graft.CacheRegistry.releaseAll()
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val someVecs = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    assert(VectorLSH.nearDupPairsAcross(
      noVecs, someVecs, "vec_id", "embedding", 0.5).count() === 0)
    assert(VectorLSH.nearDupPairsAcross(
      someVecs, noVecs, "vec_id", "embedding", 0.5).count() === 0)
    val noEvents = Seq.empty[(Long, Long, Long, Double)]
      .toDF("user_id", "event_id", "ts", "value")
    assert(graft.ops.Sessionize.rollup(noEvents).count() === 0)
    // batch-mode stream fold: no rows, no sessions, no NPE
    val noTsEvents = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    assert(graft.streaming.SessionStream.sessionize(noTsEvents).count() === 0)
  }

  test("round-8 operators are total on an empty corpus") {
    import spark.implicits._
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val cents = graft.functions.VectorIVF.mdCentroids(spark, 4, 2)
    assert(graft.functions.VectorIVF.semDedup(
      noVecs, "vec_id", "embedding", cents, "cell_id", "cvec", 0.9).count() === 0)
    graft.CacheRegistry.releaseAll()
    val noChunks = Seq.empty[(Long, Int, String, Int)]
      .toDF("doc_id", "start", "chunk_text", "n_tokens")
    val packed = graft.functions.TextAnalysis.packSequences(noChunks, "doc_id", 64)
    assert(packed.count() === 0)
    assert(packed.columns.contains("chunks") && packed.columns.contains("seq_text"))
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val someDocs = Seq((1L, (1 to 20).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(graft.functions.TextAnalysis.ngramContamination(
      noDocs, someDocs, "doc_id", "text").count() === 0)
    // empty TRAIN side: every bench doc reports zero hits, none dropped
    val vsEmpty = graft.functions.TextAnalysis.ngramContamination(
      someDocs, noDocs, "doc_id", "text").collect()
    assert(vsEmpty.length === 1 && vsEmpty.head.getAs[Long]("n_hits") === 0L)
    assert(graft.functions.TextAnalysis.ngramLogProb(
      noDocs, "doc_id", "text").count() === 0)
    graft.CacheRegistry.releaseAll()
  }
}

/** Totality on empty inputs for this round's selection / LM / resampling
  * operators — same contract as above: empty in, well-formed empty out.
  */
class EmptyInputRound9Spec extends SparkSpec {

  test("LM scoring and DSIR are total on empty corpora") {
    import spark.implicits._
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.backoffLogProb(docs, docs, "doc_id", "text").count() === 0)
    assert(TextAnalysis.dsirLogRatio(docs, docs, "doc_id", "text").count() === 0)
    assert(TextAnalysis.dsirTopK(docs, docs, "doc_id", "text", k = 5).count() === 0)
    assert(TextAnalysis.charEntropy(docs, "doc_id", "text").count() === 0)
    assert(TextAnalysis.topNgrams(docs, "text", 2, 10).count() === 0)
    graft.CacheRegistry.releaseAll()
  }

  test("selection machinery is total on empty frames") {
    import spark.implicits._
    val df = Seq.empty[(Long, String, Double)].toDF("id", "dom", "score")
    assert(graft.functions.Sampling.groupSplit(df, "dom",
      Seq("train" -> 9, "test" -> 1)).count() === 0)
    assert(graft.functions.Sampling.stratifiedQuota(df, "id", "dom",
      Map("a" -> 3)).count() === 0)
    assert(graft.functions.Sampling.percentileCalibrate(df, "score").count() === 0)
  }

  test("novelty, decontam spans, projection and ratio table are total on empty") {
    import spark.implicits._
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.functions.CorpusDiff.gramNovelty(docs, docs, "doc_id", "text")
      .count() === 0)
    assert(TextAnalysis.contaminationSpans(docs, docs, "doc_id", "text")
      .count() === 0)
    graft.CacheRegistry.releaseAll()
    val vecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.functions.VectorLSH.randomProject(vecs, "vec_id", "embedding", 4)
      .count() === 0)
    val terms = TextAnalysis.dsirRatioTable(docs, docs, "text", buckets = 8)
    assert(terms.length === 8) // pure-smoothing terms for every bucket
    assert(graft.streaming.DocStream.dsirTag(docs, terms).count() === 0)
  }

  test("paragraph dedup and resampling are total on empty frames") {
    import spark.implicits._
    val lines = Seq.empty[(Long, Seq[String])].toDF("doc_id", "lines")
    assert(TextAnalysis.dedupParagraphs(lines, "doc_id", "lines").count() === 0)
    graft.CacheRegistry.releaseAll()
    val ev = Seq.empty[(Long, Long, Long, Double)].toDF("u", "eid", "t", "v")
    assert(graft.ops.Resample.locfGrid(ev, Seq("u"), "t", "v", "eid", 10L).count() === 0)
    assert(graft.ops.Resample.trailingAgg(ev, Seq("u"), "t", "v", 10L).count() === 0)
  }

  test("semantic-decon family and stream tags are total on empty frames") {
    import spark.implicits._
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val someVecs = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    // empty train and empty bench both yield an empty flag set
    assert(graft.functions.VectorOps.semanticDecontaminate(
      noVecs, someVecs, "vec_id", "embedding", 0.5).count() === 0)
    assert(graft.functions.VectorOps.semanticDecontaminate(
      someVecs, noVecs, "vec_id", "embedding", 0.5).count() === 0)
    // stateless tags over empty input emit nothing and do not probe rows
    assert(graft.streaming.DocStream.semanticTag(
      noVecs, Seq(Seq(1.0, 0.0)), "embedding", 0.5).count() === 0)
    assert(graft.streaming.DocStream.ivfAssignTag(
      noVecs, Seq(Seq(1.0, 0.0)), "embedding", "cell").count() === 0)
    // empty corpus -> all-zero bitmap; the scan still types and runs
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val bmp = TextAnalysis.bloomGramBitmap(noDocs, "text", n = 13, bits = 64)
    assert(bmp.forall(_ == 0L))
    assert(TextAnalysis.bloomContaminationScan(
      noDocs, bmp, "doc_id", "text", n = 13).count() === 0)
  }
}

class EmptyInputRound11Spec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import graft.functions.{Sampling, TextAnalysis}

  test("round-11 selection ops are total on empty frames") {
    import spark.implicits._
    val df = Seq.empty[(Long, String)].toDF("id", "dom")
    assert(Sampling.temperatureMix(df, "id", "dom", temperature = 2.0)
      .count() === 0)
    val pts = Seq.empty[(Long, Double, Long)].toDF("id", "x", "y")
    assert(graft.ops.Skyline.skyline2D(pts, "x", "y").count() === 0)
  }
}

class EmptyInputRound12Spec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import graft.functions.Sketches

  test("round-12 sketch/quantile ops are total on empty frames") {
    import spark.implicits._
    val noH = Seq.empty[Long].toDF("h")
    // CMS gates: the sketch row exists (zero table) but no candidates
    assert(Sketches.cmsTopFreq(noH, col("h"), 4, 64, topK = 5).count() === 0)
    assert(Sketches.cmsByDomain(
      Seq.empty[(String, Long)].toDF("dom", "h"), "dom", col("h"), 4, 64)
      .count() === 0)
    // join size of two empty streams: est 0, true 0, invariant holds
    val js = Sketches.cmsJoinSize(noH, noH, col("h"), col("h"), 4, 64).head()
    assert(js.getAs[Long]("est_join") === 0L &&
      js.getAs[Long]("true_join") === 0L &&
      js.getAs[Int]("no_underestimate") === 1)
    // quantile summary: empty and all-null domains vanish
    val noV = Seq.empty[(String, Double)].toDF("dom", "v")
    assert(graft.functions.Sampling.quantilesByDomain(noV, "dom", "v")
      .count() === 0)
  }

  test("round-13 graph/fusion ops are total on empty frames") {
    import spark.implicits._
    val noE = Seq.empty[(Long, Long)].toDF("src", "dst")
    // no nodes -> no ranks (and no divide-by-zero on the N scalar)
    assert(graft.functions.GraphOps.pageRank(noE, "src", "dst").count() === 0)
    // the census row still exists and is all-zero, never null
    val t = graft.functions.GraphOps.triangleStats(noE, "src", "dst").head()
    assert((t.getLong(0), t.getLong(1), t.getLong(2), t.getLong(3),
      t.getLong(4)) === ((0L, 0L, 0L, 0L, 0L)))
    // fusing empty lists is an empty ranking
    val noL = Seq.empty[(Long, Int)].toDF("id", "rank")
    assert(graft.functions.Retrieval.rrfFuse(
      Seq("a" -> noL, "b" -> noL), "id", "rank").count() === 0)
    // k-core and seeded pagerank: no edges -> no rows, no seed-count div0
    assert(graft.functions.GraphOps.kCore(noE, "src", "dst", k = 2)
      .count() === 0)
    assert(graft.functions.GraphOps.pageRank(noE, "src", "dst",
      seeds = Some(Seq(1L).toDF("id"))).count() === 0)
    // jensenShannon: empty vs empty -> one all-zero total row, no 0/0 NaN
    val noS = Seq.empty[String].toDF("source")
    assert(graft.functions.Sampling.jensenShannon(noS, noS, "source")
      .head().toSeq === Seq.fill(10)(0L))
  }

  test("round-16 media/gram ops are total on empty and degenerate frames") {
    import spark.implicits._
    // empty sketch frame -> no pairs (no empty-reduce in the banding)
    val noSk = Seq.empty[(Long, Long)].toDF("id", "ph")
    assert(graft.functions.SimHash.hammingPairs(noSk, "id", "ph", 64)
      .count() === 0)
    // stream-static media tag: empty probe side, then empty reference side
    val sk = Seq((1L, 42L)).toDF("id", "ph")
    assert(graft.streaming.DocStream.mediaDupTag(noSk, sk, "id", "ph")
      .count() === 0)
    assert(graft.streaming.DocStream.mediaDupTag(sk, noSk, "id", "ph")
      .count() === 0)
    CacheRegistry.releaseAll()
    // a TRUNCATED blob yields null-padded pixels and the all-zero hash
    // (every null comparison falls to the 0 branch), never a throw — a
    // corrupt thumbnail must not kill the scan
    val h = Seq((1L, Array[Byte](7))).toDF("id", "blob")
      .select(graft.functions.Multimodal.grayPixels(col("blob"), 72).as("px"))
      .select(graft.functions.Multimodal.dHash64(col("px")).as("h"))
      .head()
    assert(!h.isNullAt(0) && h.getLong(0) === 0L)
    // an EMPTY corpus still produces a well-formed catalog row: the
    // top-gram census is an empty array (not null), and drift over two
    // such rows is empty, not a throw
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val row = graft.functions.CorpusCatalog.summarize(
      noDocs, "doc_id", "text", "e", topGrams = Some(4))
    assert(graft.functions.CorpusCatalog.explodeGramTopk(row).count() === 0)
    assert(graft.functions.CorpusCatalog
      .heavyGramDriftFromRows(row, row).count() === 0)
    CacheRegistry.releaseAll()
  }

  test("round-17 ops are total on empty and degenerate inputs") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // capped heavy hitters over a stream that never delivers data: no
    // emission, no throw (the state function is simply never invoked)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val out = graft.streaming.DocStream.heavyHittersCapped(
      in.toDF().toDF("source", "tok"), "source", "tok", cap = 4, k = 2)
    val q = out.writeStream.format("memory").queryName("hh_empty")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("hh_empty").count() === 0)
    // null keys/tokens are excluded, not state keys
    val in2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val out2 = graft.streaming.DocStream.heavyHittersCapped(
      in2.toDF().toDF("source", "tok"), "source", "tok", cap = 4, k = 2)
    in2.addData((null, "a"), ("web", null), ("web", "a"))
    val q2 = out2.writeStream.format("memory").queryName("hh_nulls")
      .outputMode("update").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table("hh_nulls").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq(("web", "a", 1L)))
    // grayThumb of a degenerate 1x1 image: every thumbnail cell is that
    // pixel (the area-average bounds never collapse), and the dHash of a
    // constant field is 0 — no throw on the smallest decodable image
    val img = new java.awt.image.BufferedImage(
      1, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x808080)
    val os = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", os)
    val thumb = graft.functions.Multimodal.ImageIoCodec.grayThumb(os.toByteArray)
    assert(thumb.length === 72 && thumb.distinct.length === 1)
    CacheRegistry.releaseAll()
  }
}
