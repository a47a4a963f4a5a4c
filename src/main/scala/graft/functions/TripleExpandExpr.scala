package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** A-priori triple assembly over one basket's LEX-SORTED frequent-pair
  * array (the fi2 inner loop, [[graft.operators.Relational
  * .frequentItemTriplesFrom]]): for every pair (a, b) emit (a, b, c)
  * for every pair (b, c) in the same array. Sortedness makes each
  * match set a CONTIGUOUS run of first components, found by binary
  * search — O(m log m + output) per row with ONE exact-size output
  * allocation, a single static call under whole-stage codegen.
  *
  * The equivalent higher-order-function formulation
  * (`transform(fp, x => transform(filter(fp, y => y.pa = x.pb), ...))`)
  * evaluates O(m²) interpreted lambdas and allocates a filtered array
  * per element — per-basket garbage that degrades under many
  * concurrent tasks (the r14 driver record's fi2 regression at
  * local[32]). Output rows and their order are identical: outer pairs
  * in array order, inner matches in array (= pb-ascending) order.
  *
  * Callers must supply the array lex-sorted by (pa, pb) ascending
  * (collect via `sort_array`), elements non-null.
  */
case class TripleExpandExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"triple_expand requires array<struct<bigint,bigint>>, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("part_a", LongType, nullable = false),
    StructField("part_b", LongType, nullable = false),
    StructField("part_c", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "triple_expand"

  override def nullSafeEval(fp: Any): Any =
    TripleExpandKernel.expand(fp.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      fp => s"graft.functions.TripleExpandKernel.expand($fp)")

  override protected def withNewChildInternal(newChild: Expression): TripleExpandExpr =
    copy(child = newChild)
}

object TripleExpandExpr {
  def tripleExpand(fp: Column): Column =
    ColumnShim.column(TripleExpandExpr(ColumnShim.expression(fp)))
}

object TripleExpandKernel {

  /** First index i in [0, n) with pa(i) >= key, by binary search. */
  private def lowerBound(fp: ArrayData, n: Int, key: Long): Int = {
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (fp.getStruct(mid, 2).getLong(0) < key) lo = mid + 1 else hi = mid
    }
    lo
  }

  def expand(fp: ArrayData): ArrayData = {
    val n = fp.numElements()
    // Pass 1: exact output size. Match runs are contiguous (lex sort),
    // so each outer element costs one binary search + one run scan.
    var out = 0
    var i = 0
    while (i < n) {
      val b = fp.getStruct(i, 2).getLong(1)
      var j = lowerBound(fp, n, b)
      while (j < n && fp.getStruct(j, 2).getLong(0) == b) { out += 1; j += 1 }
      i += 1
    }
    val rows = new Array[Any](out)
    var k = 0
    i = 0
    while (i < n) {
      val x = fp.getStruct(i, 2)
      val a = x.getLong(0)
      val b = x.getLong(1)
      var j = lowerBound(fp, n, b)
      var cont = j < n
      while (cont) {
        val y = fp.getStruct(j, 2)
        if (y.getLong(0) == b) {
          rows(k) = new GenericInternalRow(Array[Any](a, b, y.getLong(1)))
          k += 1
          j += 1
          cont = j < n
        } else cont = false
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** Boxed convenience for tests: (pa, pb) pairs → (a, b, c) triples. */
  def expandPairs(pairs: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val rows = expand(new GenericArrayData(pairs.map { case (a, b) =>
      new GenericInternalRow(Array[Any](a, b)): Any
    }.toArray))
    (0 until rows.numElements()).map { i =>
      val r = rows.getStruct(i, 3)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
  }
}
