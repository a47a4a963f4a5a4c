package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |a ∩ b| for two SORTED long arrays — the inner loop of
  * edge-iterator triangle counting ([[graft.operators.Graph]]): one
  * two-pointer sweep, zero allocation, a single static call under
  * whole-stage codegen. `array_intersect`+`size` would build a hash
  * set and an output array per row — per-edge garbage that dominates
  * once the edge frame hits hundreds of millions of rows.
  *
  * Callers must supply both sides sorted ascending (collect via
  * `sort_array`); duplicate-free inputs yield exact intersection
  * cardinality.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint> inputs, got $l / $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectKernel.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedIntersectKernel.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectKernel {
  /** Σ wa[i] where a[i] matches some element of b; a and b sorted
    * ascending, wa aligned with a. Long weights keep the sum exact.
    */
  def weightSum(a: ArrayData, b: ArrayData, wa: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var s = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { s += wa.getLong(i); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    s
  }

  def count(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** Σ wa[i] over matches of two SORTED long arrays — the weighted
  * companion of [[SortedIntersectCountExpr]] for common-neighbor
  * scoring ([[graft.operators.Graph.edgeStrength]]): `wa` is aligned
  * index-for-index with `a`, weights are pre-scaled exact longs so
  * the per-row sum is order-invariant and cross-engine exact. Same
  * zero-allocation two-pointer sweep, one static call under
  * whole-stage codegen.
  */
case class SortedIntersectWeightSumExpr(
    first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, w) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_weight_sum requires three array<bigint> inputs, got $a / $b / $w")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_weight_sum"

  override def nullSafeEval(a: Any, b: Any, w: Any): Any =
    SortedIntersectKernel.weightSum(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, w) => s"graft.functions.SortedIntersectKernel.weightSum($a, $b, $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedIntersectWeightSumExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedIntersectExpr {
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnShim.column(SortedIntersectCountExpr(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  def sortedIntersectWeightSum(a: Column, b: Column, wa: Column): Column =
    ColumnShim.column(SortedIntersectWeightSumExpr(
      ColumnShim.expression(a), ColumnShim.expression(b),
      ColumnShim.expression(wa)))
}
