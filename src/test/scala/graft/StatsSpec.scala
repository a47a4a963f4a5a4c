package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Round-8 part 3: statistical-inference family — each gate checked
  * against an in-test brute-force replica on the (small) sf0.001 data,
  * independent of the DuckDB oracle.
  */
class StatsSpec extends SparkSpec {

  private def values(t: String): Array[Double] =
    Tables.events(spark, sf).filter(col("event_type") === t)
      .select(col("value")).collect().map(_.getDouble(0))

  test("wt1: t statistic matches a direct two-pass computation") {
    val r = Stats.welchTTest(spark, sf).head()
    val (a, b) = (values("purchase"), values("click"))
    assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length)
    def meanVar(x: Array[Double]): (Double, Double) = {
      val m = x.sum / x.length
      (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
    }
    val (ma, va) = meanVar(a); val (mb, vb) = meanVar(b)
    val t = (ma - mb) / math.sqrt(va / a.length + vb / b.length)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-4)
    assert(math.abs(r.getAs[Double]("mean_a") - ma) < 1e-4)
    assert(math.abs(r.getAs[Double]("var_b") - vb) < 1e-3)
  }

  test("mw1: U equals the brute pairwise count with half-ties") {
    val r = Stats.mannWhitneyU(spark, sf).head()
    val (a, b) = (values("purchase"), values("click"))
    // U for group A = #(a > b) + 0.5·#(a == b) over all cross pairs.
    var u = 0.0
    for (x <- a; y <- b) {
      if (x > y) u += 1.0 else if (x == y) u += 0.5
    }
    assert(math.abs(r.getAs[Double]("u_stat") - u) < 1e-6)
    val z = r.getAs[Double]("z_score")
    assert(!z.isNaN && math.abs(z) < 10)
  }

  test("woe1: positives reconcile and WOE tracks the bin odds") {
    val rows = Stats.weightOfEvidence(spark, sf).collect()
    val totPos = rows.map(_.getAs[Long]("n_pos")).sum
    val totNeg = rows.map(_.getAs[Long]("n_neg")).sum
    val nF = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F").count()
    assert(totPos == nF)
    assert(totPos + totNeg == Tables.orders(spark, sf).count())
    rows.foreach { rr =>
      val pp = (rr.getAs[Long]("n_pos") + 0.5) / totPos
      val pn = (rr.getAs[Long]("n_neg") + 0.5) / totNeg
      assert(math.abs(rr.getAs[Double]("woe") - math.log(pp / pn)) < 1e-4)
      // IV terms are non-negative by construction: (p−q)·ln(p/q) ≥ 0.
      assert(rr.getAs[Double]("iv_term") >= -1e-9)
    }
  }

  test("xc1: lag-0 matches a direct Pearson over the joint hour spine") {
    val rows = Stats.laggedCrossCorrelation(spark, sf).collect()
    val lag0 = rows.find(_.getAs[Int]("lag_hours") == 0).get
    val hourly = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) div 3600000000L")
        .as("hi"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val his = hourly.keys.map(_._1).toSeq.distinct
    val pairs = his.flatMap { h =>
      for (x <- hourly.get((h, "click")); y <- hourly.get((h, "purchase")))
        yield (x.toDouble, y.toDouble)
    }
    val n = pairs.length
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val corr = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(lag0.getAs[Long]("n_pairs") == n)
    assert(math.abs(lag0.getAs[Double]("xcorr") - corr) < 1e-4)
  }

  test("hw1: fold replays exactly in local Scala") {
    val rows = Stats.holtLinearTrend(spark, sf).collect()
    val series = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000L").as("hi"))
      .agg(count(lit(1)).as("n"))
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) =>
        t -> rs.sortBy(_.getLong(1)).map(_.getLong(2).toDouble)
      }
    rows.foreach { rr =>
      val xs = series(rr.getAs[String]("event_type"))
      var l = xs(0); var b = xs(1) - xs(0)
      for (x <- xs.drop(1)) { // fold x₂..xₙ, same complement-free forms
        val lp = l + b
        val lNew = lp + 0.5 * (x - lp)
        b = b + 0.3 * ((lNew - l) - b)
        l = lNew
      }
      assert(rr.getAs[Long]("n_hours") == xs.length)
      assert(math.abs(rr.getAs[Double]("level") - l) < 1e-5)
      assert(math.abs(rr.getAs[Double]("trend") - b) < 1e-5)
    }
  }

  test("ga1: assortativity matches brute Pearson over the double cover") {
    val r = Stats.degreeAssortativity(spark, sf).head()
    val edges = graft.operators.Graph.copurchaseEdges(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val directed = edges ++ edges.map(e => (e._2, e._1))
    val deg = directed.groupBy(_._1).map { case (k, v) => k -> v.length }
    val ps = directed.map { case (u, v) => (deg(u).toDouble, deg(v).toDouble) }
    val n = ps.length
    val (sx, sy) = (ps.map(_._1).sum, ps.map(_._2).sum)
    val sxy = ps.map(p => p._1 * p._2).sum
    val sxx = ps.map(p => p._1 * p._1).sum
    val syy = ps.map(p => p._2 * p._2).sum
    val corr = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(r.getAs[Long]("n_directed_edges") == n)
    assert(math.abs(r.getAs[Double]("assortativity") - corr) < 1e-4)
  }

  test("ar1: confidence and lift recompute from raw supports") {
    val rules = Stats.associationRules(spark, sf).collect()
    assert(rules.nonEmpty)
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nBaskets = items.map(_._1).distinct.length
    val supp = items.groupBy(_._2).map { case (k, v) => k -> v.length }
    val pairSupp = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    rules.take(20).foreach { rr =>
      val (a, c) = (rr.getAs[Long]("ante"), rr.getAs[Long]("cons"))
      val sab = pairSupp(if (a < c) (a, c) else (c, a))
      assert(rr.getAs[Long]("supp_ab") == sab)
      assert(math.abs(rr.getAs[Double]("confidence")
        - sab.toDouble / supp(a)) < 1e-4)
      assert(math.abs(rr.getAs[Double]("lift")
        - sab.toDouble * nBaskets / (supp(a).toDouble * supp(c))) < 1e-3)
    }
  }

  test("anova1: F statistic matches the brute grouped computation") {
    val r = Stats.anovaOneWay(spark, sf).head()
    val groups = Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
      .collect().map(x => (x.getString(0), x.getDouble(1)))
      .groupBy(_._1).values.map(_.map(_._2)).toSeq
    val n = groups.map(_.length).sum
    val k = groups.size
    val grand = groups.flatten.sum / n
    val ssb = groups.map(g => g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.length
      g.map(v => (v - m) * (v - m)).sum }).sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(r.getAs[Long]("k_groups") == k && r.getAs[Long]("n_rows") == n)
    assert(math.abs(r.getAs[Double]("ss_between") - ssb) < math.abs(ssb) * 1e-6 + 1e-3)
    assert(math.abs(r.getAs[Double]("ss_within") - ssw) < math.abs(ssw) * 1e-6 + 1e-3)
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-4)
    assert(r.getAs[Long]("df1") == k - 1 && r.getAs[Long]("df2") == n - k)
  }
}
