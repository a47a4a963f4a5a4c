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

  test("forward as-of returns the minimal next purchase per click") {
    val out = Relational.asofNextPurchase(spark, sf).collect()
    assert(out.nonEmpty)
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .collect()
    val byId = e.map(r => r.getLong(0) -> r).toMap
    val purchases = e.filter(_.getString(2) == "purchase")
      .groupBy(_.getLong(1)).view.mapValues(_.map(r => (r.getTimestamp(3), r.getLong(0)))).toMap
    out.foreach { r =>
      val clickTs = byId(r.getLong(0)).getTimestamp(3)
      val nexts = purchases.getOrElse(r.getLong(1), Array.empty[(java.sql.Timestamp, Long)])
        .filter(!_._1.before(clickTs))
      if (r.isNullAt(2)) assert(nexts.isEmpty)
      else {
        val minTs = nexts.map(_._1.getTime).min
        val want = nexts.filter(_._1.getTime == minTs).map(_._2).max
        assert(r.getLong(2) == want,
          s"click ${r.getLong(0)}: got ${r.getLong(2)}, want $want")
      }
    }
  }

  test("hourly anomalies are exactly the >= 2-sigma hours") {
    val out = graft.operators.Quality.hourlyAnomalies(spark, sf).collect()
    val hours = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts"))).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val nh = hours.length.toDouble
    val mu = hours.sum / nh
    val sd = math.sqrt(hours.map(n => n.toDouble * n).sum / nh - mu * mu)
    val want = hours.count(n => math.abs((n - mu) / sd) >= 2.0)
    assert(out.length == want)
    assert(out.forall(r => math.abs(r.getDouble(2)) >= 2.0))
  }

  test("hourly anomalies: zero-variance corpus flags nothing (no NaN sweep)") {
    // Equal hourly counts -> variance 0 -> z would be 0/0 = NaN, and
    // Spark's NaN ordering makes abs(NaN) >= 2 TRUE: without the guard
    // EVERY hour gets flagged. Expect zero anomaly rows.
    val dir = tmpDir("zerovar")
    val baseNs = 1700000000000000000L
    val hourNs = 3600L * 1000000000L
    val rows = for { h <- 0 until 3; i <- 0 until 4 } yield
      (h * 4L + i, baseNs + h * hourNs + i * 1000000000L, 1L, "click", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(graft.operators.Quality.hourlyAnomalies(spark, dir).count() == 0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("incremental aggregate maintenance equals the full recompute") {
    val inc = graft.operators.Ingest.incrementalAggMaintenance(spark, sf)
      .collect().map(_.toSeq)
    val full = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("total_value"))
      .orderBy(col("event_type")).collect().map(_.toSeq)
    assert(inc.toSeq == full.toSeq)
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

  test("ij1 interval join: plans equi-join (no nested loop) and matches brute force") {
    val df = Relational.intervalCountJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to a nested loop:\n$plan")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // local brute force over micro-truncated timestamps
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
    val clicks = e.filter(_.getString(1) == "click").map(_.getLong(2))
    val W = 60000000L
    e.filter(_.getString(1) == "purchase").foreach { p =>
      val want = clicks.count(c => math.abs(c - p.getLong(2)) <= W).toLong
      assert(got(p.getLong(0)) == want,
        s"purchase ${p.getLong(0)}: got ${got(p.getLong(0))}, want $want")
    }
  }
}
