package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity over two string columns — the fuzzy
  * record-linkage scorer Spark's built-in function set lacks
  * (`levenshtein` exists; Jaro-Winkler does not). Implemented as a
  * codegen'd BinaryExpression calling a primitive kernel, so an
  * N²-candidate fuzzy-match join keeps the whole score inside
  * WholeStageCodegen — a Scala UDF here would box every row AND break
  * the codegen span around the join.
  *
  * Semantics are the classic Winkler variant (and match DuckDB's
  * `jaro_winkler_similarity`, which the f8 oracle uses): match window
  * max(l1,l2)/2 − 1, transpositions = half the mismatches between
  * matched sequences, prefix bonus up to 4 chars at weight 0.1 applied
  * only when jaro > 0.7.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires string inputs, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StringKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object StringKernels {

  /** Primitive Jaro-Winkler on UTF8String (decoded once to char
    * arrays; corpus text is ASCII, and for BMP text String.charAt
    * units match what DuckDB's byte-oriented scorer sees on ASCII).
    */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    // DuckDB convention (fuzz-verified, 50k pairs bit-exact): any empty
    // side — including both empty — scores 0.0.
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: mismatches between the two matched subsequences
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    // Winkler prefix bonus, classic gating at 0.7
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (prefix < maxP && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

object JaroWinkler {
  /** Column-API entry point (mirrors the other native kernels). */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnShim.column(JaroWinklerExpr(ColumnShim.expression(a), ColumnShim.expression(b)))
}
