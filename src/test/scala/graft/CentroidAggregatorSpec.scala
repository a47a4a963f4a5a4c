package graft

import org.apache.spark.sql.functions._
import graft.functions.CentroidAggregator

class CentroidAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed centroid equals the posexplode+avg formulation") {
    val typed = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(CentroidAggregator.toColumn.name("centroid"))
      .collect()
      .map { case (l, c) => l -> c.toSeq }.toMap

    val exploded = Tables.embeddings(spark, sf)
      .select(col("label"), posexplode(col("embedding")))
      .toDF("label", "dim", "x")
      .groupBy("label", "dim")
      .agg(avg(col("x").cast("double")).as("c"))
      .groupBy("label")
      .agg(sort_array(collect_list(struct(col("dim"), col("c")))).as("cs"))
      .collect()
      .map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)).toSeq).toMap

    assert(typed.keySet == exploded.keySet && typed.nonEmpty)
    typed.foreach { case (l, c) =>
      val e = exploded(l)
      assert(c.length == e.length)
      c.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("v3 gate determinism: per-cluster component sums are exact in any order") {
    // The v3 oracle hash-compares doubles across engines, which is only
    // sound if the double sums are EXACT (then partition/merge order
    // cannot matter). Sufficient condition, checked per cluster×dim:
    // every addend is a multiple of 2^m (m = lowest set mantissa bit
    // across the group's values), so every partial sum is too, and any
    // partial sum magnitude is <= sum(|x|); if sum(|x|) < 2^(m+53) each
    // partial sum fits in a double's 53-bit mantissa => no rounding.
    def lowestBitExp(x: Double): Int = {
      val bits = java.lang.Double.doubleToLongBits(x)
      val mant = (bits & 0xfffffffffffffL) |
        (if (Math.getExponent(x) > -1023) 1L << 52 else 0L)
      Math.getExponent(x).max(-1022) - 52 + java.lang.Long.numberOfTrailingZeros(mant)
    }
    val groups = Tables.embeddings(spark, sf)
      .select((col("vec_id") % 10).cast("int").as("cluster"),
        posexplode(col("embedding")))
      .toDF("cluster", "dim", "x")
      .collect()
      .groupBy(r => (r.getInt(0), r.getInt(1)))
      .view.mapValues(_.map(_.getFloat(2).toDouble).filter(_ != 0.0))
    assert(groups.nonEmpty)
    groups.foreach { case ((cl, d), xs) =>
      if (xs.nonEmpty) {
        val m = xs.map(lowestBitExp).min
        val absSum = xs.map(x => BigDecimal(math.abs(x))).sum
        assert(absSum < BigDecimal(2).pow(m + 53),
          s"cluster $cl dim $d: |sum| ${absSum.toDouble} risks rounding at 2^${m + 53}")
      }
    }
  }

  test("centroid of empty input is empty; of one vector is itself") {
    val one = Seq((1, Array(1.0f, 2.0f))).toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(CentroidAggregator.toColumn.name("c")).collect()
    assert(one(0)._2.toSeq == Seq(1.0, 2.0))
  }
}
