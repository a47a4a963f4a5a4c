package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries ([[graft.operators.Dedup
  * .chunkDedup]]): one pass over the document's code points keeps a
  * 16-slot circular window of mixed char hashes and emits every
  * 1-based position where the window-bag hash ≡ 0 (mod 64) — the
  * shift-robust boundary rule that makes chunk-level dedup survive
  * insertions (a byte edit moves at most the two chunks around it,
  * unlike fixed-size blocks where everything downstream shifts).
  *
  * The window hash is a BAG (order-free sum) of per-char mixes
  * rather than a positional Rabin polynomial: it windows with O(1)
  * update in both this kernel and plain SQL (the DuckDB oracle is a
  * windowed SUM), at the cost of anagram-insensitivity — irrelevant
  * for boundary selection, which only needs a deterministic
  * content-driven 1/64 coin.
  *
  * Mean chunk ≈ 64 chars; no min-length state (stateless boundaries
  * keep the rule embarrassingly parallel and SQL-mirrorable), so
  * consumers floor the REPORTED chunks instead. Expects BMP-safe
  * text; positions count code points, matching SQL `substring`
  * character indexing.
  */
case class CdcBoundsExpr(child: Expression,
                         window: Int = 16, divisor: Long = 64L)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_bounds requires string input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_bounds"

  override def nullSafeEval(input: Any): Any =
    CdcKernel.bounds(input.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcKernel.bounds($c, $window, ${divisor}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundsExpr =
    copy(child = newChild)
}

object CdcKernel {
  /** Per-char mix: Knuth multiplicative hash into a 31-bit prime
    * field — matches `(unicode(c) * 2654435761) % 2147483647` in SQL.
    */
  @inline private def mix(cp: Int): Long = (cp * 2654435761L) % 2147483647L

  def bounds(str: UTF8String, window: Int, divisor: Long): GenericArrayData = {
    val s = str.toString
    val ring = new Array[Long](window)
    var out = List.empty[Long]
    var nOut = 0
    var sum = 0L
    var charIdx = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val slot = charIdx % window
      val g = mix(cp)
      if (charIdx >= window) sum -= ring(slot)
      ring(slot) = g
      sum += g
      charIdx += 1
      if (charIdx >= window && sum % divisor == 0L) {
        out = charIdx.toLong :: out
        nOut += 1
      }
    }
    val arr = new Array[Any](nOut)
    var j = nOut - 1
    while (j >= 0) { arr(j) = out.head; out = out.tail; j -= 1 }
    new GenericArrayData(arr)
  }
}

object CdcBoundsExpr {
  def cdcBounds(c: Column): Column =
    ColumnShim.column(CdcBoundsExpr(ColumnShim.expression(c)))
}
