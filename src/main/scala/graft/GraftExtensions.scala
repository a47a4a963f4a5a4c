package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.functions.{CharTrigramsExpr, DotProductExpr, JaroWinklerExpr, PolyFingerprintExpr}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions in the SQL function registry so `spark.sql` users get
  * them too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT poly_fingerprint(text), dot_product(a, b) FROM t")
  * }}}
  *
  * Also injectable via config for uncontrolled session construction:
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("poly_fingerprint"),
      new ExpressionInfo(classOf[PolyFingerprintExpr].getName, "poly_fingerprint"),
      (children: Seq[Expression]) => PolyFingerprintExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (children: Seq[Expression]) => DotProductExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("char_trigrams"),
      new ExpressionInfo(classOf[CharTrigramsExpr].getName, "char_trigrams"),
      (children: Seq[Expression]) => CharTrigramsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      (children: Seq[Expression]) => JaroWinklerExpr(children(0), children(1))))
  }
}
