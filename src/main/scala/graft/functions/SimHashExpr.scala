package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash signature kernel: 64-bit sketch of an `array<long>` of
  * feature hashes — bit i of the output is the sign of the sum of
  * (+1/-1) votes from each hash's bit i.
  *
  * The higher-order formulation runs 64 separate `aggregate` folds
  * over the array per row; this kernel makes one pass accumulating all
  * 64 counters (same result, ~64× fewer array traversals, zero
  * intermediate allocation, full codegen).
  */
case class SimHashSigExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<long> input, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSigExpr =
    copy(child = newChild)
}

object SimHashKernel {
  def sig(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

object SimHashExpr {
  def simhashSig(c: Column): Column =
    ColumnShim.column(SimHashSigExpr(ColumnShim.expression(c)))
}
