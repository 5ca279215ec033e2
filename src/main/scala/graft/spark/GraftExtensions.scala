package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.spark.functions.VecDot

/** Catalyst integration entry point: `spark.sql.extensions=graft.spark.GraftExtensions`.
  *
  * Injects:
  *   1. `vec_dot(a, b)` as a SQL-callable function (the codegen'd
  *      [[graft.spark.functions.VecDot]] expression), so SQL users get the
  *      allocation-free dot product without touching the Column API.
  *   2. An optimizer rule ([[GraftExtensions.RewriteDotProduct]]) that
  *      recognises the composed built-in idiom
  *      `aggregate(zip_with(a, b, (x, y) -> cast(x AS double) * cast(y AS double)),
  *      0D, (s, v) -> s + v)` over two ARRAY<FLOAT> columns and rewrites it
  *      to `vec_dot(a, b)`. The composed form materialises a dim-sized
  *      intermediate array per row-pair — at ANN-scale (millions of pairs)
  *      that is pure GC pressure; the rewrite is strictly
  *      semantics-preserving because VecDot reproduces the composed form's
  *      NULL behaviour (ragged arrays and null elements both yield NULL) and
  *      its left-to-right double accumulation bit-for-bit.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDotFunction)
    ext.injectOptimizerRule(_ => GraftExtensions.RewriteDotProduct)
  }
}

object GraftExtensions {

  val vecDotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(
      classOf[VecDot].getName, null, "vec_dot",
      "_FUNC_(a, b) - dot product of two ARRAY<FLOAT> vectors, accumulated " +
        "left-to-right in double; NULL on length mismatch or null element.",
      "", "", "", "array_funcs", "", "", "built-in"),
    (args: Seq[Expression]) => args match {
      case Seq(a, b) => VecDot(a, b)
      case _ => throw new IllegalArgumentException(
        s"vec_dot requires exactly 2 arguments, got ${args.length}")
    }
  )

  /** `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0D, (s,v) -> s+v)`
    * over ARRAY<FLOAT> → `VecDot(a, b)`.
    */
  object RewriteDotProduct extends Rule[LogicalPlan] {

    private def isFloatArray(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    private def sameVar(e: Expression, v: NamedExpression): Boolean = e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }

    /** body is `cast(x AS double) * cast(y AS double)` over exactly the two
      * lambda variables, in either operand order (double multiply commutes
      * bit-identically).
      */
    private def isCastMultiply(body: Expression, x: NamedExpression,
        y: NamedExpression): Boolean = body match {
      case Multiply(Cast(l, DoubleType, _, _), Cast(r, DoubleType, _, _), _) =>
        (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))
      case _ => false
    }

    /** body is `s + v` over exactly the two lambda variables (double add
      * commutes bit-identically).
      */
    private def isVarSum(body: Expression, s: NamedExpression,
        v: NamedExpression): Boolean = body match {
      case Add(l, r, _) =>
        (sameVar(l, s) && sameVar(r, v)) || (sameVar(l, v) && sameVar(r, s))
      case _ => false
    }

    private def isIdentityLambda(e: Expression): Boolean = e match {
      case LambdaFunction(body, Seq(arg), _) => sameVar(body, arg)
      case _ => false
    }

    private def isDoubleZero(e: Expression): Boolean = e match {
      case Literal(z: Double, DoubleType) =>
        java.lang.Double.doubleToRawLongBits(z) == 0L // +0.0 exactly
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case ArrayAggregate(
              ZipWith(a, b, LambdaFunction(mul, Seq(x, y), _)),
              zero,
              LambdaFunction(merge, Seq(s, v), _),
              finish)
            if isFloatArray(a) && isFloatArray(b) && isDoubleZero(zero) &&
              isCastMultiply(mul, x, y) && isVarSum(merge, s, v) &&
              isIdentityLambda(finish) =>
          VecDot(a, b)
      }
  }
}
