package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character-trigram kernel.
  *
  * The higher-order formulation (`transform(sequence(1, len-2),
  * i -> substr(s, i, 3))`) is interpreted (HOFs have no codegen) and —
  * worse — `substr` locates codepoint i by scanning from the start of
  * the string, so a length-L document costs O(L²) codepoint scans
  * (measured ~9 s for the langid pass at sf0.1; this kernel: one pass,
  * one output allocation, ~1 s).
  *
  * Single pass: record the byte offset of every codepoint start, then
  * slice each 3-codepoint byte window directly; first-occurrence
  * dedup via a LinkedHashSet (UTF8String hashes by bytes). Strings
  * shorter than 3 codepoints yield an empty array — same guard as
  * [[graft.operators.Dedup.shinglesFromWords]].
  */
case class CharTrigramsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_trigrams requires string input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"

  override def nullSafeEval(input: Any): Any =
    CharTrigramsKernel.trigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharTrigramsKernel.trigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): CharTrigramsExpr =
    copy(child = newChild)
}

object CharTrigramsKernel {
  def trigrams(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // Codepoint start offsets (+ end sentinel).
    val starts = new Array[Int](s.numChars() + 1)
    var cp = 0
    var i = 0
    while (i < nBytes) {
      starts(cp) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      cp += 1
    }
    starts(cp) = nBytes
    if (cp < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](cp * 2)
    var j = 0
    while (j <= cp - 3) {
      seen.add(UTF8String.fromBytes(bytes, starts(j), starts(j + 3) - starts(j)))
      j += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }
}

object CharTrigramsExpr {
  def charTrigrams(c: Column): Column =
    ColumnShim.column(CharTrigramsExpr(ColumnShim.expression(c)))
}
