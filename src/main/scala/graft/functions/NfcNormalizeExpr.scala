package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel (7th native codegen expression).
  *
  * Text hygiene every multi-source corpus needs before dedup or
  * tokenization: the same visible string can arrive precomposed
  * ("é", U+00E9) or decomposed ("e" + U+0301) depending on the source
  * OS/editor, and every hash-based operator in this engine (exact
  * dedup, MinHash, winnowing, vocab building) would treat them as
  * different documents. Spark ships NO normalization function — the
  * usual workaround is a Scala UDF (no codegen, boxing per row); this
  * is a proper Catalyst expression instead.
  *
  * Fast paths, in order:
  *  1. pure-ASCII input (`numBytes == numChars`) — already NFC by
  *     construction; return the input UTF8String untouched (no String
  *     round-trip, no allocation). This is the overwhelmingly common
  *     case in web corpora.
  *  2. `Normalizer.isNormalized` — one scan, no allocation, covers
  *     non-ASCII text that is already composed.
  *  3. full `Normalizer.normalize` only for genuinely decomposed rows.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string input, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcKernel {
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes() == s.numChars()) return s // ASCII is always NFC
    val t = s.toString
    if (java.text.Normalizer.isNormalized(t, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC))
  }
}

object NfcNormalizeExpr {
  def nfcNormalize(c: Column): Column =
    ColumnShim.column(NfcNormalizeExpr(ColumnShim.expression(c)))
}
