package graft.exec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Primitive-int kernels for the reference's greedy positional matchers,
  * operating directly on Catalyst [[ArrayData]] — no `Seq[Seq[Int]]`
  * boxing, no CatalystTypeConverters round-trip. Semantics are the exact
  * transliterations of [[PositionOps]] (`QryEval/src/QryopIlNear.java:74-120`,
  * `QryopIlWindow.java:92-166`); a property spec asserts kernel ≡
  * PositionOps on random inputs.
  *
  * Inputs are the engine's own position lists: non-null, ascending ints
  * (the index builder emits them sorted). Null elements are not handled —
  * the planner never produces them.
  */
object PositionKernels {
  private val Empty: UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)

  /** `#NEAR/n` ordered chain — greedy single-consume, result = matched
    * positions of the LAST argument; empty ⇒ no match. */
  def near(ps: ArrayData, distance: Int): ArrayData = {
    val k = ps.numElements()
    var prev: Array[Int] = ps.getArray(0).toIntArray()
    var prevLen = prev.length
    var j = 1
    while (j < k) {
      val cur = ps.getArray(j)
      val curLen = cur.numElements()
      val temp = new Array[Int](if (prevLen < curLen) prevLen else curLen)
      var t = 0
      var m = 0
      var n = 0
      while (m < prevLen && n < curLen) {
        val prevPos = prev(m)
        val nextPos = cur.getInt(n)
        if (nextPos < prevPos) n += 1
        else if (nextPos - prevPos <= distance) {
          temp(t) = nextPos; t += 1; n += 1; m += 1
        } else m += 1
      }
      if (t == 0) return Empty
      prev = temp
      prevLen = t
      j += 1
    }
    if (prevLen == prev.length) UnsafeArrayData.fromPrimitiveArray(prev)
    else UnsafeArrayData.fromPrimitiveArray(
      java.util.Arrays.copyOf(prev, prevLen))
  }

  /** `#WINDOW/n` unordered — if max-min <= n-1 emit MAX and advance ALL
    * pointers, else advance only MIN (strict-comparison `validation`
    * quirk preserved: minIdx/maxIdx move only on strict </>, max test is
    * an else-if of the min test). Args must already be df-ascending
    * (caller sorts). Every emission advances all pointers, so the result
    * holds at most min(list lengths) entries. */
  def window(ps: ArrayData, distance: Int): ArrayData = {
    val k = ps.numElements()
    val lists = new Array[ArrayData](k)
    val posPtr = new Array[Int](k)
    val termPos = new Array[Int](k)
    val termLength = new Array[Int](k)
    var i = 0
    var minTotal = Int.MaxValue
    while (i < k) {
      val l = ps.getArray(i)
      lists(i) = l
      termLength(i) = l.numElements()
      termPos(i) = l.getInt(0)
      if (termLength(i) < minTotal) minTotal = termLength(i)
      i += 1
    }
    val temp = new Array[Int](minTotal)
    var t = 0
    var hasMorePos = true
    while (hasMorePos) {
      var minPos = termPos(0)
      var maxPos = termPos(0)
      var minIdx = 0
      var maxIdx = 0
      var v = 1
      while (v < k) {
        if (termPos(v) < minPos) { minPos = termPos(v); minIdx = v }
        else if (termPos(v) > maxPos) { maxPos = termPos(v); maxIdx = v }
        v += 1
      }
      if (maxPos - minPos <= distance - 1) {
        temp(t) = termPos(maxIdx); t += 1
        var j = 0
        var broke = false
        while (j < k && !broke) {
          posPtr(j) += 1
          if (posPtr(j) >= termLength(j)) { hasMorePos = false; broke = true }
          else { termPos(j) = lists(j).getInt(posPtr(j)); j += 1 }
        }
      } else {
        posPtr(minIdx) += 1
        if (posPtr(minIdx) >= termLength(minIdx)) hasMorePos = false
        else termPos(minIdx) = lists(minIdx).getInt(posPtr(minIdx))
      }
    }
    if (t == 0) Empty
    else UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(temp, t))
  }
}

/** Codegen'd replacement for the former `udf((ps: Seq[Seq[Int]], d: Int)
  * => ...)` position matchers — the last row-at-a-time UDFs on the hot
  * path (every matching doc of a positional query, and every SDM
  * positional leaf, paid Seq-of-Seq boxing per row; same promotion that
  * bought [[graft.ops.DotProduct]] 5-10×). Generated code is a single
  * static call on [[ArrayData]], so the projection stays inside
  * whole-stage codegen with no serialization barrier.
  *
  * `ordered=true` ⇒ #NEAR chain; false ⇒ #WINDOW. Returns an empty array
  * (not null) when the doc does not match, like the UDF returned
  * `Seq.empty` — callers filter `size > 0`.
  */
case class PositionMatch(child: Expression, distance: Int, ordered: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(IntegerType, _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"position_match needs array<array<int>>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val ps = input.asInstanceOf[ArrayData]
    if (ordered) PositionKernels.near(ps, distance)
    else PositionKernels.window(ps, distance)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (ordered) "near" else "window"
    defineCodeGen(ctx, ev,
      c => s"graft.exec.PositionKernels.$fn($c, $distance)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PositionExpressions {
  /** Greedy `#NEAR/distance` over an `array<array<int>>` column. */
  def near(posLists: Column, distance: Int): Column =
    ColumnBridge.column(
      PositionMatch(ColumnBridge.expression(posLists), distance, ordered = true))

  /** Greedy `#WINDOW/distance` over a df-ascending `array<array<int>>`. */
  def window(posLists: Column, distance: Int): Column =
    ColumnBridge.column(
      PositionMatch(ColumnBridge.expression(posLists), distance, ordered = false))
}
