package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the per-document shingle-hash loop — the
  * hot inner loop of every text-dedup operator (MinHash, exact Jaccard,
  * winnowing, n-gram decontamination).
  *
  * The `functions`-level formulation
  * (`transform(sequence(...), i => conv(substring(md5(concat_ws(" ",
  * element_at(w, i+1)...)), 1, 15), 16, 10))`) is correct but interpreted:
  * higher-order lambdas evaluate outside whole-stage codegen, re-walking an
  * expression tree of n `element_at`s plus a hex round-trip (md5 bytes →
  * hex string → substring → base-16 string parse) per gram. This expression
  * keeps the row pipeline in codegen and computes each gram in one tight
  * JVM loop, deriving the 60-bit value directly from the digest bytes.
  *
  * Result semantics match the column formula BIT-FOR-BIT (property-pinned
  * in `NativeShingleSpec`): grams start at every 0-based position
  * `0..size-n` (an array shorter than n yields an EMPTY array — never an
  * out-of-range access, so inferred-filter duplication cannot throw);
  * null elements are skipped exactly as `concat_ws` skips them (no
  * separator emitted); the hash is the first 15 hex digits of the md5 of
  * the UTF-8 gram bytes read as a base-16 number — 60 bits, the same value
  * `conv(substring(md5(x), 1, 15), 16, 10)` produces and every DuckDB
  * oracle replays.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n > 0, s"n=$n must be positive")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def nullSafeEval(words: Any): Any =
    ShingleHashes.compute(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.plans.ShingleHashes.compute($w, $n);")
}

object ShingleHashes {
  // MessageDigest is stateful and not thread-safe; one per executor thread,
  // reset per gram — no per-gram allocation (DigestUtils.md5 in the column
  // path constructs a fresh instance per call).
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** One hash per gram start; empty output for arrays shorter than n. */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    val md = digests.get()
    var i = 0
    while (i < out.length) {
      md.reset()
      var first = true
      var k = 0
      while (k < n) {
        // concat_ws semantics: a null element contributes nothing, not
        // even its separator
        if (!words.isNullAt(i + k)) {
          if (!first) md.update(' '.toByte)
          md.update(words.getUTF8String(i + k).getBytes)
          first = false
        }
        k += 1
      }
      val d = md.digest()
      // first 15 hex digits of the md5 = 7 full bytes + the high nibble of
      // byte 7, read big-endian as one 60-bit value — exactly
      // conv(substring(hex, 1, 15), 16, 10)
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
      out(i) = (v << 4) | ((d(7) & 0xF0L) >>> 4)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native per-row character-entropy kernel — the scalar twin of
  * [[graft.functions.TextAnalysis.charEntropy]] (same
  * `H = ln n − (Σ round(c·ln c·1e6))/1e6/n` integer-grid formula,
  * property-pinned equal in `NativeEntropySpec`), evaluated in one pass
  * over the string's code points with a local histogram. The aggregation
  * shape is right for corpus audits; THIS shape is right where a
  * stateless per-row gate is needed — a streaming filter
  * ([[graft.streaming.DocStream.entropyGate]]) or a scored-view column —
  * since an explode+groupBy cannot run as a stream projection. NULL for
  * null/empty input (the aggregation's no-row case).
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_entropy"

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)

  override def nullSafeEval(text: Any): Any =
    CharEntropy.compute(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("entropyBoxed")
    nullSafeCodeGen(ctx, ev, t =>
      s"""java.lang.Double $resultTerm = graft.plans.CharEntropy.compute($t);
         |if ($resultTerm == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $resultTerm.doubleValue(); }""".stripMargin)
  }
}

object CharEntropy {
  /** Boxed so the empty-string case can surface as SQL NULL. */
  def compute(text: org.apache.spark.unsafe.types.UTF8String): java.lang.Double = {
    val s = text.toString
    if (s.isEmpty) return null
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Long](1))
      slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    var terms = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      // c >= 1 so c·ln c >= 0: HALF_UP == Math.round on the grid term
      terms += Math.round(c * Math.log(c) * 1e6)
    }
    val h = Math.log(n.toDouble) - terms.toDouble / 1e6 / n
    java.math.BigDecimal.valueOf(h)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

/** Registration for [[ShingleHashes]] under the SQL name `graft_shingles`. */
object TextExpressions {

  private val fid = FunctionIdentifier("graft_shingles")
  private val info = new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingles")
  private[plans] val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"graft_shingles expects 2 arguments, got ${exprs.length}")
    require(exprs(1).foldable, "graft_shingles n must be a literal")
    ShingleHashes(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue)
  }

  private val entropyFid = FunctionIdentifier("graft_entropy")
  private val entropyInfo =
    new ExpressionInfo(classOf[CharEntropy].getName, "graft_entropy")
  private[plans] val entropyBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1,
      s"graft_entropy expects 1 argument, got ${exprs.length}")
    CharEntropy(exprs.head)
  }

  /** Idempotent runtime registration (see [[VectorExpressions.ensureRegistered]]). */
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(fid, info, builder)
    spark.sessionState.functionRegistry.registerFunction(
      entropyFid, entropyInfo, entropyBuilder)
  }

  /** `Column` surface: hashes of the n-word grams of a string-array column. */
  def shinglesColumn(spark: SparkSession, words: Column, n: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_shingles", words, org.apache.spark.sql.functions.lit(n))
  }

  /** `Column` surface: per-row char-entropy in nats (null for empty). */
  def entropyColumn(spark: SparkSession, text: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_entropy", text)
  }
}
