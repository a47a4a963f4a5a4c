package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: polynomial rolling hash over code points,
  * mod 1e9+7 — the classic Rabin-Karp content fingerprint, implemented
  * as a native Catalyst `Expression` WITH codegen so it stays inside
  * WholeStageCodegen (a Scala UDF here would break the codegen span
  * and serialize every row through an extra closure call).
  *
  * The modulus is < 2^31 so the recurrence `h*131 + cp` never exceeds
  * ~2^38 — safe in 64-bit arithmetic on both this engine and the
  * DuckDB oracle (which mirrors the fold as
  * `list_reduce(chars, (a,b) -> (a*131+b) % 1000000007)`).
  *
  * North-star text-analysis operator (no counterpart in the reference,
  * whose only scalar computations are host-language timestamps —
  * SURVEY §2.6).
  */
case class PolyFingerprintExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_fingerprint requires STRING input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"

  override def nullSafeEval(input: Any): Any =
    PolyFingerprint.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyFingerprint.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprintExpr =
    copy(child = newChild)
}

object PolyFingerprint {
  final val Base = 131L
  final val Mod  = 1000000007L

  /** Left fold over Unicode code points: h = (h*131 + cp) mod 1e9+7. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column-level entry point. */
  def fingerprint(c: Column): Column =
    ColumnShim.column(PolyFingerprintExpr(ColumnShim.expression(c)))
}
