package graft.exec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Float-faithful scoring as native Catalyst expressions.
  *
  * Spark coerces `Divide` operands to DoubleType, so the reference's FLOAT
  * intermediates (SURVEY §2.4 — `QryopSlScore.java:142-157,200-210,243`)
  * cannot be reproduced with Column arithmetic. These expressions evaluate
  * (and codegen) the exact Java float expressions the reference executes,
  * widening to double only at the end — bit-identical scores, fully inside
  * whole-stage codegen (no UDF boxing on the hot path).
  *
  * Model parameters and per-term statistics (rsj, avgDocLen, mle) are
  * query-time scalars, embedded as Java float literals
  * (`Float.toString` round-trips exactly).
  */
private object FloatLit {
  def apply(f: Float): String =
    if (f.isNaN) "Float.NaN"
    else if (f == Float.PositiveInfinity) "Float.POSITIVE_INFINITY"
    else if (f == Float.NegativeInfinity) "Float.NEGATIVE_INFINITY"
    else java.lang.Float.toString(f) + "f"
}

/** BM25 per-posting score (`QryopSlScore.java:146-157`):
  * `(double)(rsj * (tf / (tf + k1 * (1 - b + b * docLen / avgDocLen))))`
  * with every intermediate a Java float. */
case class Bm25TermScore(left: Expression, right: Expression,
    rsj: Float, k1: Float, b: Float, avgDocLen: Float)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(tfA: Any, lenA: Any): Any = {
    val tf = tfA.asInstanceOf[Int]
    val docLen = lenA.asInstanceOf[Long]
    val tfWeight: Float = tf / (tf + k1 * (1 - b + b * docLen / avgDocLen))
    (rsj * tfWeight).toDouble
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (tf, len) =>
      s"(double)(${FloatLit(rsj)} * ((float)$tf / ((float)$tf + " +
      s"${FloatLit(k1)} * ((1.0f - ${FloatLit(b)}) + " +
      s"(${FloatLit(b)} * (float)$len) / ${FloatLit(avgDocLen)}))))")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Indri Dirichlet-smoothed QL per-posting score
  * (`QryopSlScore.java:200-210`):
  * `(double)(lambda*(tf + mu*mle)/(docLen + mu) + (1-lambda)*mle)`,
  * all-float. */
case class IndriTermScore(left: Expression, right: Expression,
    mu: Float, lambda: Float, mle: Float) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(tfA: Any, lenA: Any): Any = {
    val tf = tfA.asInstanceOf[Int]
    val docLen = lenA.asInstanceOf[Long]
    val s: Float = lambda * (tf + mu * mle) / (docLen + mu) +
      (1 - lambda) * mle
    s.toDouble
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (tf, len) =>
      s"(double)((${FloatLit(lambda)} * ((float)$tf + " +
      s"${FloatLit(mu)} * ${FloatLit(mle)})) / ((float)$len + ${FloatLit(mu)}) + " +
      s"(1.0f - ${FloatLit(lambda)}) * ${FloatLit(mle)})")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Indri default (non-matching doc) score (`QryopSlScore.java:233-247`,
  * factored form at :243):
  * `(double)((lambda*mu/(docLen + mu) + (1-lambda)) * mle)`, all-float. */
case class IndriDefaultScore(child: Expression,
    mu: Float, lambda: Float, mle: Float) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(lenA: Any): Any = {
    val docLen = lenA.asInstanceOf[Long]
    (((lambda * mu / (docLen + mu)) + (1 - lambda)) * mle).toDouble
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, len =>
      s"(double)(((${FloatLit(lambda)} * ${FloatLit(mu)}) / ((float)$len + " +
      s"${FloatLit(mu)}) + (1.0f - ${FloatLit(lambda)})) * ${FloatLit(mle)})")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `StrictMath.pow` as an expression. `java.lang.Math.pow` is an
  * `@IntrinsicCandidate`: a cold (interpreted) call runs the fdlibm
  * StrictMath fallback while a JIT-compiled call runs the HotSpot
  * intrinsic, and the two can differ by 1 ulp — non-deterministic scores
  * across runs. The engine and the in-repo oracle therefore both use
  * StrictMath.pow (deterministic on every JVM). */
case class StrictPow(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    StrictMath.pow(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.StrictMath.pow($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Java float division `(float)a / (float)b` — Spark's `Divide` coerces
  * fractional operands to double, so the reference's float quotients
  * (e.g. pMLE = `(float) ctf / collectionLength`,
  * `QryEval/src/QryExpansion.java` / `QryopSlScore.java:200`) need a
  * dedicated expression. Operands are longs; result FloatType. */
case class FloatDivide(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.FloatType
  override def nullSafeEval(a: Any, b: Any): Any =
    a.asInstanceOf[Long].toFloat / b.asInstanceOf[Long]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"(float)$a / (float)$b")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `StrictMath.log` — same determinism rationale as [[StrictPow]]. */
case class StrictLog(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    StrictMath.log(a.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"java.lang.StrictMath.log($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScoreExpressions {
  private def e(c: Column) = ColumnBridge.expression(c)
  def bm25(tf: Column, len: Column, rsj: Float, k1: Float, b: Float,
           avgDocLen: Float): Column =
    ColumnBridge.column(Bm25TermScore(e(tf), e(len), rsj, k1, b, avgDocLen))
  def indri(tf: Column, len: Column, mu: Float, lambda: Float,
            mle: Float): Column =
    ColumnBridge.column(IndriTermScore(e(tf), e(len), mu, lambda, mle))
  def indriDefault(len: Column, mu: Float, lambda: Float,
                   mle: Float): Column =
    ColumnBridge.column(IndriDefaultScore(e(len), mu, lambda, mle))
  def strictPow(base: Column, exp: Column): Column =
    ColumnBridge.column(StrictPow(e(base), e(exp)))
  def floatDiv(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDivide(e(a), e(b)))
  def strictLog(a: Column): Column =
    ColumnBridge.column(StrictLog(e(a)))
}
