package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string's UTF-8 bytes — the
  * compression-ratio quality signal pretraining filters use to catch
  * machine-generated/boilerplate text: highly repetitive documents
  * compress far below natural prose (ratio ≲ 0.3 vs ~0.4–0.7), random
  * noise barely compresses at all (≈ 1.0). Deterministic for a fixed
  * level (java.util.zip is zlib with pinned parameters), so the gated
  * output is stable across runs and JVMs.
  *
  * Codegen-friendly: a native UnaryExpression whose generated code is
  * one static call — the whole quality pass stays inside one
  * WholeStageCodegen span. The kernel allocates a Deflater per CALL
  * (not pooled): `setInput`+`deflate` over a doc costs far more than
  * the object, and per-call lifecycle keeps the expression
  * thread-safe under codegen without ThreadLocal cleanup concerns.
  */
case class DeflateSizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_size requires string input, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(input: Any): Any =
    DeflateKernel.deflatedSize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateKernel.deflatedSize($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSizeExpr =
    copy(child = newChild)
}

object DeflateKernel {
  /** Compressed byte count at BEST_SPEED without materializing the
    * compressed stream beyond a 8 KiB scratch buffer: we only need
    * the SIZE, so output bytes are counted and discarded.
    */
  def deflatedSize(s: UTF8String): Long = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
    try {
      d.setInput(s.getBytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

object DeflateSizeExpr {
  def deflateSize(c: Column): Column =
    ColumnShim.column(DeflateSizeExpr(ColumnShim.expression(c)))
}
