package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.types._

/** Fused dot product over two `array<float>` or two `array<double>`
  * columns (both sides the same element type), accumulated in double,
  * element order left-to-right — same fold order as the
  * zip_with+aggregate higher-order formulation and the DuckDB oracle's
  * list fold, but a native codegen'd Expression: the HOFs are
  * CodegenFallback, so on the ANN hot loop (every query×candidate pair)
  * this removes per-element closure dispatch entirely. The double-array
  * form serves derived vectors (perturbed/averaged embeddings are
  * double after arithmetic); float→double promotion is exact, so a
  * float corpus vector scores identically through either form.
  *
  * Degenerate-input semantics (differs from the HOF form, which yields
  * null): arrays of different lengths are truncated to the shorter one,
  * and null ELEMENTS read as 0.0 — i.e. missing/null components
  * contribute nothing to the sum. A top-level null array still yields
  * null (null-safe eval). Embedding columns are fixed-dimension and
  * non-null in every engine path, so the two formulations agree there;
  * the truncate/zero behavior is deliberate for the hot loop (no
  * per-element branch).
  *
  * Preference order per SURVEY §2.10: built-ins first; this is the one
  * place the built-ins genuinely can't express the fused loop, so a
  * custom `Expression` with `doGenCode` is tier (b).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }
  private lazy val isDouble: Boolean = elemType(left).contains(DoubleType)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) => a == b
      case _ => false
    }
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> or two array<double> " +
          s"arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (isDouble)
      while (i < n) {
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
    else
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val get = if (isDouble) "getDouble" else "getFloat"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $x.$get($i)) * ((double) $y.$get($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object DotProductF {
  import org.apache.spark.sql.GraftBridge

  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(DotProductF(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Fused EXACT integer dot product over two `array<bigint>` columns —
  * the scorer for int8-quantized embeddings (SimQueries q60/q61): codes
  * are small ints, so Σ aᵢ·bᵢ fits int64 with astronomical headroom
  * (64 dims × 127² ≈ 2²⁰) and the result is exact, order-independent,
  * and bit-identical in every engine — no floating-point at all until
  * the caller rescales. Same degenerate-input semantics as
  * [[DotProductF]]: truncate to the shorter array, null elements read
  * as 0, top-level null yields null.
  */
case class DotLongF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_int"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object DotLongF {
  import org.apache.spark.sql.GraftBridge

  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(DotLongF(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Session extension registering the graft_* functions for SQL
  * callers: `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Arity gate with a readable message (a wrong-arity SQL call should
    * not surface as an IndexOutOfBoundsException).
    */
  private def arity(fn: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$fn expects $n arguments, got ${exprs.length}")

  /** Foldable integer argument (the signature shapes are plan
    * constants); rejects non-literal and non-integral arguments with a
    * message naming the function instead of a ClassCastException.
    */
  private def intArg(e: Expression, fn: String): Int = {
    val ok = e.foldable && (e.dataType match {
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType => true
      case _ => false
    })
    if (!ok) throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got ${e.sql}")
    e.eval().asInstanceOf[Number].intValue
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoin.AsOfJoinStrategy)
    e.injectPlannerStrategy(_ =>
      graft.plans.IntervalJoin.IntervalJoinStrategy)
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        arity("graft_dot", exprs, 2)
        DotProductF(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_dot_int"),
      new ExpressionInfo(classOf[DotLongF].getName, "graft_dot_int"),
      (exprs: Seq[Expression]) => {
        arity("graft_dot_int", exprs, 2)
        DotLongF(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashF].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => {
        arity("graft_simhash", exprs, 2)
        SimhashF(exprs(0), intArg(exprs(1), "graft_simhash"))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinhashSigF].getName, "graft_minhash_sig"),
      (exprs: Seq[Expression]) => {
        arity("graft_minhash_sig", exprs, 4)
        MinhashSigF(exprs(0),
          intArg(exprs(1), "graft_minhash_sig"),
          intArg(exprs(2), "graft_minhash_sig"),
          intArg(exprs(3), "graft_minhash_sig"))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_shingle_set"),
      new ExpressionInfo(classOf[ShingleSetF].getName, "graft_shingle_set"),
      (exprs: Seq[Expression]) => {
        arity("graft_shingle_set", exprs, 3)
        ShingleSetF(exprs(0),
          intArg(exprs(1), "graft_shingle_set"),
          intArg(exprs(2), "graft_shingle_set"))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKPairsF].getName, "graft_topk"),
      (exprs: Seq[Expression]) => {
        arity("graft_topk", exprs, 3)
        // analysis wraps a bare AggregateFunction into an
        // AggregateExpression (ResolveFunctions)
        TopKPairsF(exprs(0), exprs(1), intArg(exprs(2), "graft_topk"))
      }))
  }
}
