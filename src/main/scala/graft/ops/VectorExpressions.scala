package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Left-fold dot product of two `array<double>` columns as a native
  * codegen'd expression.
  *
  * Semantically identical to `aggregate(zip_with(a, b, (x, y) => x * y),
  * 0.0, (acc, v) => acc + v)` — the same doubles added in the same
  * left-to-right order, so every similarity score it feeds stays
  * bit-identical to the DuckDB oracle's `list_reduce` fold. The
  * higher-order-function form, however, is evaluated OUTSIDE whole-stage
  * codegen (a zip_with array allocation plus interpreted lambda calls per
  * row); this expression compiles to a tight primitive loop inside the
  * generated code — the hot path of every SRP band key, bucket id, and
  * candidate-pair cosine (64 multiply-adds per call, millions of calls
  * per near-dup verify).
  *
  * Null semantics match the HOF form: null result on null/length-mismatch
  * inputs (zip_with pads with null and `acc + null` poisons the fold) and
  * on any null element.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Float arrays are read natively and widened PER ELEMENT — a
    * `cast("array<double>")` on the input would materialize a fresh
    * array per call (32 band-key dots per vector), which measured 2×
    * slower than the HOF fold it was meant to beat. */
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  private lazy val leftFloat = isFloat(left)
  private lazy val rightFloat = isFloat(right)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType |
        org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var i = 0
    var sum = 0.0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      def get(arr: String, isF: Boolean) =
        if (isF) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${get(a, leftFloat)} * ${get(b, rightFloat)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** dot(a, b) with the deterministic left-fold order; accepts
    * `array<float>` or `array<double>` on either side, widening each
    * element exactly where the HOF form cast it before multiplying. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
