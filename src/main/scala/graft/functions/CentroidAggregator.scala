package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: element-wise centroid of embedding vectors —
  * the engine's example of a custom typed aggregation over
  * `Dataset[T]` (SURVEY §2.7: the one Aggregator the build plan
  * allows itself).
  *
  * Why an Aggregator and not posexplode+avg: the typed form merges
  * fixed-size double arrays in place — zero row explosion (a 64-dim
  * corpus would otherwise shuffle 64× its row count through the
  * explode), mergeable partials for free, and compile-time types at
  * the call site via `ds.groupByKey(...).agg(CentroidAggregator.toColumn)`.
  */
object CentroidAggregator
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) Array.emptyDoubleArray
    else r._1.map(_ / r._2)

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
