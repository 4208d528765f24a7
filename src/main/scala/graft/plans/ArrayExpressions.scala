package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native intersection-count kernel for SORTED distinct long arrays — the
  * per-candidate verify of every exact set-similarity join (Jaccard,
  * containment) and of the LSH families' exact confirm step.
  *
  * The `functions`-level formulation `size(array_intersect(a, b))` is
  * correct but allocation-bound: Spark's `ArrayIntersect` builds an
  * `OpenHashSet` over one side AND materializes the full intersection
  * array per row — only for `size` to read its length and drop it. On a
  * pair-verify stage that runs once per CANDIDATE (not per doc), that is
  * the dominant allocation source of the whole join: the round-16 driver
  * bench measured 48 s of GC on d131's 688 tasks where the quiet-box run
  * of the same plan pays 2.4 s. This expression counts common elements
  * with a two-pointer merge — ZERO allocation, no boxing, whole-stage
  * codegen-friendly — and returns the count directly.
  *
  * CONTRACT: both inputs must be ascending-sorted with distinct elements,
  * which is exactly what [[graft.functions.MinHashLSH.shingleArrays]]
  * emits (`sort_array(array_distinct(...))` — the one producer every
  * call site derives from; property-pinned in `SortedIntersectSpec`).
  * Unsorted input silently undercounts — never pass arrays from any
  * other derivation without sorting them first.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_count"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SortedLongIntersectCount.compute($a, $b);")
}

object SortedLongIntersectCount {
  /** Two-pointer merge count; 0 for empty inputs.
    *
    * Null ELEMENTS are refused loudly: `ArrayType(LongType)` defaults to
    * `containsNull = true`, and `ArrayData.getLong` on a null slot reads
    * whatever bytes sit there — a silent miscount, not an error. No
    * producer in this engine emits null shingles (they come from
    * xxhash64), so the branch below is never-taken in the hot path
    * (predicted free); it exists to turn a future bad producer into an
    * exception instead of a wrong Jaccard.
    */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "graft_intersect_count: null array element — inputs must be " +
            "ascending-sorted DISTINCT NON-NULL long arrays " +
            "(the shingleArrays contract)")
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}

/** Registration for [[SortedLongIntersectCount]] under the SQL name
  * `graft_intersect_count` (the [[TextExpressions]] discipline).
  */
object ArrayExpressions {

  private val fid = FunctionIdentifier("graft_intersect_count")
  private val info = new ExpressionInfo(
    classOf[SortedLongIntersectCount].getName, "graft_intersect_count")
  private[plans] val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_intersect_count expects 2 arguments, got ${exprs.length}")
    SortedLongIntersectCount(exprs.head, exprs(1))
  }

  /** Idempotent runtime registration (see [[VectorExpressions.ensureRegistered]]). */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(fid, info, builder)

  /** `Column` surface: |a ∩ b| for ascending-sorted distinct long arrays. */
  def intersectCountColumn(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_intersect_count", a, b)
  }
}
