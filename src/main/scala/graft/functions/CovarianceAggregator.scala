package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` accumulating the sufficient statistics of a
  * d-dimensional covariance matrix in ONE pass: per-dim sums (d),
  * upper-triangle outer-product sums (d(d+1)/2), and the count.
  *
  * This is the 100 TB PCA shape: the corpus is scanned once with
  * map-side combine (partials are fixed-size arrays, ~17 KB at d=64
  * regardless of row count), a single reduce merges them, and only
  * the O(d²) statistic ever reaches the driver — where the O(d³)
  * eigen step is a microsecond problem. Exploding to (i, j, x_i·x_j)
  * rows would shuffle d²/2 rows per input row instead.
  *
  * finish() lays out [n, sum_0..sum_{d-1}, ss_upper...] in one array
  * so the caller can rebuild mean and covariance without a custom
  * result type.
  */
object CovarianceAggregator
    extends Aggregator[Array[Float], (Array[Double], Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Array[Double], Long) =
    (Array.emptyDoubleArray, Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Array[Double], Long),
                      v: Array[Float]): (Array[Double], Array[Double], Long) = {
    val d = v.length
    val s = if (b._1.isEmpty) new Array[Double](d) else b._1
    val ss = if (b._2.isEmpty) new Array[Double](d * (d + 1) / 2) else b._2
    var i = 0
    var k = 0
    while (i < d) {
      val vi = v(i).toDouble
      s(i) += vi
      var j = i
      while (j < d) { ss(k) += vi * v(j); j += 1; k += 1 }
      i += 1
    }
    (s, ss, b._3 + 1)
  }

  override def merge(a: (Array[Double], Array[Double], Long),
                     b: (Array[Double], Array[Double], Long)): (Array[Double], Array[Double], Long) =
    if (a._3 == 0) b
    else if (b._3 == 0) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      var k = 0
      while (k < a._2.length) { a._2(k) += b._2(k); k += 1 }
      (a._1, a._2, a._3 + b._3)
    }

  override def finish(r: (Array[Double], Array[Double], Long)): Array[Double] = {
    val out = new Array[Double](1 + r._1.length + r._2.length)
    out(0) = r._3.toDouble
    System.arraycopy(r._1, 0, out, 1, r._1.length)
    System.arraycopy(r._2, 0, out, 1 + r._1.length, r._2.length)
    out
  }

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  override def bufferEncoder: Encoder[(Array[Double], Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](),
      ExpressionEncoder[Array[Double]](), Encoders.scalaLong)
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
