package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product.
  *
  * The pure-`functions` formulation (`aggregate(zip_with(a, b, _*_), …)`)
  * is correct but interpreted: higher-order functions sit outside
  * whole-stage codegen and allocate a lambda frame per element. This
  * expression compiles to a tight primitive `double` loop inside the
  * generated code — the preferred extension order from the builder brief:
  * native `Expression` with `doGenCode` beats a Scala UDF.
  *
  * Result semantics match the HOF version bit-for-bit: left-to-right
  * summation, `null` out if either array (or any element) is null, and
  * `null` when the lengths differ — `zip_with` null-pads the shorter array,
  * so the HOF sum is null there too; ragged vectors must not silently score
  * as a prefix dot product.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[ArrayType] conforms.
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  /** Nullable even when both arrays are non-null: a null ELEMENT nulls the
    * result, so the default child-derived nullability would under-report
    * (and let the null decay to 0.0 in non-nullable readers).
    */
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Native squared-L2 distance — [[DotProduct]]'s twin for the PQ family
  * ([[graft.functions.VectorPQ]]): `Σ (a_i − b_i)²` as one primitive
  * `double` loop in generated code. Identical semantics to the HOF
  * formulation `aggregate(zip_with(a, b, (x,y) => (x−y)*(x−y)), 0.0, +)`
  * BIT-FOR-BIT: left-to-right summation (so the DuckDB `list_reduce`
  * oracles replay it unchanged), null out on null arrays, null elements,
  * or length mismatch.
  */
case class SqDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2"
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistance =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |double $acc = 0.0;
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Registration for [[DotProduct]] under the SQL name `graft_dot`. */
object VectorExpressions {

  private val fid = FunctionIdentifier("graft_dot")
  private val info = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")
  private[plans] val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"graft_dot expects 2 arguments, got ${exprs.length}")
    DotProduct(exprs.head, exprs(1))
  }

  /** Idempotently register into an existing session (the driver owns the
    * SparkSession in the harness, so config-time extensions aren't
    * guaranteed — this is the runtime path the library calls itself).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(fid, info, builder)
    spark.sessionState.functionRegistry.registerFunction(l2Fid, l2Info, l2Builder)
  }

  private val l2Fid = FunctionIdentifier("graft_l2")
  private val l2Info = new ExpressionInfo(classOf[SqDistance].getName, "graft_l2")
  private[plans] val l2Builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"graft_l2 expects 2 arguments, got ${exprs.length}")
    SqDistance(exprs.head, exprs(1))
  }

  /** `Column` surface: registers on first use, then plain `call_function`. */
  def dotColumn(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)
  }

  /** `Column` surface for the squared-L2 kernel. */
  def l2Column(spark: SparkSession, a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.registerFunction(l2Fid, l2Info, l2Builder)
    org.apache.spark.sql.functions.call_function("graft_l2", a, b)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` for deployments that
  * own the session config (a real cluster) — same function, injected at
  * session build instead of first use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  // Reuse the runtime-registry builders so both registration paths share
  // the same arity/foldability guards (a one-arg or non-literal-n SQL call
  // must fail with the clear require message, not an IndexOutOfBounds or
  // an obscure eval error).
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      VectorExpressions.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingles"),
      TextExpressions.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "graft_entropy"),
      TextExpressions.entropyBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_l2"),
      new ExpressionInfo(classOf[SqDistance].getName, "graft_l2"),
      VectorExpressions.l2Builder))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      PqExpressions.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvSketch].getName, "graft_kmv"),
      SketchExpressions.builder))
  }
}
