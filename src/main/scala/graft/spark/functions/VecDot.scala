package graft.spark.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two ARRAY<FLOAT> columns, accumulating in double
  * left-to-right (bit-identical to `aggregate(zip_with(a, b, (x, y) ->
  * double(x) * double(y)), 0D, (s, v) -> s + v)` but with no per-pair array
  * allocation and full whole-stage codegen).
  *
  * Exact composed semantics, including the edge cases: a length mismatch or
  * a null element yields NULL (zip_with pads the shorter array with nulls,
  * and one null product nulls the whole sum), so the optimizer rewrite in
  * [[graft.spark.GraftExtensions]] is strictly semantics-preserving.
  *
  * Replaces the composed built-in form on the ANN hot path: the composed
  * expression materializes a dim-sized intermediate array per PAIR, which at
  * a million comparisons is pure GC pressure; this expression reads both
  * ArrayData buffers in place. The scalar loop stays inside Tungsten codegen
  * (doGenCode below), so the broadcast-crossJoin ANN plan remains one
  * WholeStageCodegen span. The per-element null check is emitted only when
  * the array type says elements can be null.
  */
final case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // ragged arrays yield NULL
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> arguments, " +
            s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elemsNullable(left) || elemsNullable(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullCheck =
        if (elemsNullable(left) || elemsNullable(right))
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column-API face: `VecDot(col("embedding"), col("qe"))`. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
