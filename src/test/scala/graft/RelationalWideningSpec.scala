package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Round-4 relational-surface gates: unpivot (p2), map functions (f7),
  * linear interpolation (ts2), exact grouped mode (x10).
  */
class RelationalWideningSpec extends SparkSpec {
  import spark.implicits._

  test("unpivot emits metrics x rows and loses nothing") {
    val parts = Tables.part(spark, sf).count()
    val out = Relational.unpivotPartMetrics(spark, sf)
    assert(out.count() == parts * 2)
    assert(out.select("metric").distinct().as[String].collect().sorted.toSeq ==
      Seq("p_retailprice", "p_size"))
  }

  test("map round-trip is lossless vs the plain group count") {
    val viaMap = Relational.mapTypeCounts(spark, sf).collect().map(_.toSeq)
    val plain = Tables.events(spark, sf)
      .filter(col("user_id") < 20)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("user_id"), col("event_type")).collect().map(_.toSeq)
    assert(viaMap.toSeq == plain.toSeq)
  }

  test("interpolation is total over the spine, exact on known hours, bounded between neighbors") {
    val out = Relational.interpolateHourly(spark, sf).collect()
    assert(out.length > 0)
    // spine is dense: consecutive hour strings, no gaps
    val hours = out.map(_.getString(0))
    assert(hours.distinct.length == hours.length)
    // interpolated values sit between the neighboring known values
    val vals = out.map(r => (r.getInt(1), r.getDouble(2)))
    var i = 0
    while (i < vals.length) {
      if (vals(i)._1 == 1) {
        val prev = (i - 1 to 0 by -1).find(j => vals(j)._1 == 0).map(j => vals(j)._2)
        val next = (i + 1 until vals.length).find(j => vals(j)._1 == 0).map(j => vals(j)._2)
        (prev, next) match {
          case (Some(p), Some(n)) =>
            val lo = math.min(p, n) - 1e-6; val hi = math.max(p, n) + 1e-6
            assert(vals(i)._2 >= lo && vals(i)._2 <= hi)
          case _ => // edge clamp: equals the single known neighbor
        }
      }
      i += 1
    }
  }

  test("grouped mode picks the max count with value-asc tiebreak") {
    val out = Relational.modeQuantityPerFlag(spark, sf).collect()
    val counts = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getString(0))
    out.foreach { r =>
      val grp = counts(r.getString(0))
      val maxN = grp.map(_.getLong(2)).max
      assert(r.getLong(2) == maxN)
      val tied = grp.filter(_.getLong(2) == maxN).map(_.getDouble(1)).min
      assert(r.getDouble(1) == tied)
    }
  }
}
