package graft

import org.apache.spark.sql.functions._
import graft.operators.{Behavior, Relational}

class StatsSegmentsSpec extends SparkSpec {

  test("chi-square: parity cohorts are independent of event type") {
    val rows = Relational.chiSquareIndependence(spark, sf).collect()
    assert(rows.length == 10) // 5 types x 2 cohorts
    val chi2 = rows.map(_.getAs[Double]("chi2_term")).sum
    // dof = (5-1)(2-1) = 4; 0.999 quantile ~ 18.47 — a parity split
    // of synthetic uniform events must not look dependent
    assert(chi2 < 18.47, s"chi2 $chi2 flags dependence on a parity split")
    val totalObs = rows.map(_.getAs[Long]("obs")).sum
    assert(totalObs == Tables.events(spark, sf).count())
  }

  test("mutual information: bounded by marginal entropies, near zero on independent cohorts") {
    val r = Relational.mutualInformation(spark, sf).head
    val (mi, hx, hy) = (r.getAs[Double]("mi_nats"),
      r.getAs[Double]("h_x"), r.getAs[Double]("h_y"))
    assert(mi >= 0, s"MI must be non-negative, got $mi")
    assert(mi <= math.min(hx, hy) + 1e-9, s"MI $mi exceeds min marginal entropy")
    // user_id % 4 is independent of event_type in the synthetic data:
    // MI should be a small fraction of the entropies (sampling noise only)
    assert(mi < 0.01 * math.min(hx, hy), s"independent cohorts look dependent: $mi")
    assert(hx <= math.log(5.0) + 1e-9 && hy <= math.log(4.0) + 1e-9,
      "entropies exceed log(cardinality)")
    assert(r.getAs[Long]("n") == Tables.events(spark, sf).count())
  }

  test("group split: every source lands in exactly one split (no leakage)") {
    val rows = graft.operators.TextAnalysis.groupSplit(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(rows.map(_.getAs[Long]("n_groups")).sum ==
      docs.select("source").distinct().count(),
      "splits must partition the group universe — a source in two splits is leakage")
    // doc-level hash split CANNOT guarantee this: group split must
    // place all docs of each source together
    val perSource = docs.select(col("source")).distinct().count()
    assert(rows.length <= 3 && rows.map(_.getAs[Long]("n_groups")).forall(_ <= perSource))
  }

  test("zipf: slope is negative and the fit covers the whole (small) vocabulary") {
    val r = graft.operators.TextAnalysis.tokenZipf(spark, sf).head
    val vocab = Tables.documents(spark, sf)
      .select(explode(graft.operators.TextAnalysis.words(col("text"))).as("t"))
      .distinct().count()
    assert(r.getAs[Long]("n_tokens") == math.min(vocab, 1000L))
    assert(r.getAs[Double]("slope") < 0, "rank-frequency slope must be negative")
    // intercept = predicted ln(freq) at rank 1 — bounded by the max count
    val maxN = Tables.documents(spark, sf)
      .select(explode(graft.operators.TextAnalysis.words(col("text"))).as("t"))
      .groupBy("t").count().agg(max("count")).head.getLong(0)
    assert(r.getAs[Double]("intercept") <= math.log(maxN.toDouble) + 1.0)
  }

  test("split KL: non-negative both directions, near zero for a representative split") {
    val r = graft.operators.Quality.splitKlDivergence(spark, sf).head
    val (a, b) = (r.getAs[Double]("kl_train_eval"), r.getAs[Double]("kl_eval_train"))
    assert(a >= 0 && b >= 0, "KL divergence cannot be negative")
    // sources are assigned to splits independently of language, so
    // the language mix should roughly carry over the wall
    assert(a < 0.5 && b < 0.5, s"split looks unrepresentative: $a / $b")
    assert(r.getAs[Long]("n_langs") ==
      Tables.documents(spark, sf).select("lang").distinct().count())
  }

  test("rolling forecast: window fit matches a local OLS replay per row") {
    val rows = graft.operators.Quality.rollingForecast(spark, sf).collect()
    assert(rows.length > 0)
    val hourly = Tables.events(spark, sf)
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("h"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val idx = hourly.map(_._1).zipWithIndex.toMap
    rows.take(10).foreach { r =>
      val i = idx(r.getAs[String]("hour_start")) + 1 // 1-based like row_number
      val win = ((i - 24) until i).map(j => (j + 1).toDouble -> hourly(j)._2.toDouble)
      val (c, sx, sy) = (win.size.toDouble, win.map(_._1).sum, win.map(_._2).sum)
      val sxx = win.map(p => p._1 * p._1).sum
      val sxy = win.map(p => p._1 * p._2).sum
      val slope = (c * sxy - sx * sy) / (c * sxx - sx * sx)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-5,
        s"slope mismatch at ${r.getAs[String]("hour_start")}")
      val fc = (sy - slope * sx) / c + slope * (i + 1)
      assert(math.abs(r.getAs[Double]("forecast_next") - fc) < 1e-4,
        s"forecast mismatch at ${r.getAs[String]("hour_start")}")
    }
  }

  test("ols: fitted line reproduces mean price at mean quantity") {
    val r = Relational.olsPriceOnQuantity(spark, sf).head
    val (slope, icept) = (r.getAs[Double]("slope"), r.getAs[Double]("intercept"))
    val m = Tables.lineitem(spark, sf)
      .agg(avg(col("l_quantity")), avg(col("l_extendedprice"))).head
    val (mx, my) = (m.getDouble(0), m.getDouble(1))
    // OLS identity: the regression line passes through (x-bar, y-bar)
    assert(math.abs(slope * mx + icept - my) / my < 1e-4,
      s"line misses the centroid: ${slope * mx + icept} vs $my")
  }

  test("rfm segments: quartiles partition customers evenly per axis") {
    val rows = Behavior.rfmSegments(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(total == nCust)
    Seq("r_q", "f_q", "m_q").foreach { axis =>
      val byAxis = rows.groupBy(_.getAs[Int](axis))
        .view.mapValues(_.map(_.getAs[Long]("n_customers")).sum)
      assert(byAxis.keys.toSet == Set(1, 2, 3, 4))
      val sizes = byAxis.values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$axis quartiles uneven: $byAxis")
    }
  }

  test("ewma: smoother stays inside the series envelope and starts at x0") {
    val rows = graft.operators.Quality.ewmaHourly(spark, sf).collect()
    assert(rows.length == 48)
    val ns = rows.map(_.getAs[Long]("n").toDouble)
    val (lo, hi) = (ns.min, ns.max)
    rows.foreach { r =>
      val e = r.getAs[Double]("ewma")
      assert(e >= lo - 1e-6 && e <= hi + 1e-6, s"ewma escaped envelope: $r")
    }
    assert(math.abs(rows.head.getAs[Double]("ewma") - ns.head) < 1e-6,
      "first ewma must equal the first observation after renormalization")
    // smoothing: the ewma series varies less than the raw series
    def spread(xs: Seq[Double]) = xs.max - xs.min
    assert(spread(rows.map(_.getAs[Double]("ewma")).toSeq) <= spread(ns.toSeq))
  }

  test("k-anonymity audit: classes partition customers, diversity bounded by size") {
    val rows = graft.operators.Quality.kAnonymityAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("class_size")).sum
    assert(total == Tables.customer(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("l_diversity") <= r.getAs[Long]("class_size"))
      assert(r.getAs[Boolean]("k10_violation") == (r.getAs[Long]("class_size") < 10))
    }
  }

  test("seasonal profile: residuals offset the seasonal mean exactly") {
    val rows = graft.operators.Quality.seasonalProfile(spark, sf).collect()
    assert(rows.length == 48)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val m = r.getAs[Double]("seasonal_mean")
      val res = r.getAs[Double]("residual")
      assert(math.abs((m + res) - n) < 2e-6, s"decomposition broken: $r")
    }
  }

  test("ab readout: groups partition users, z consistent with lift sign") {
    val r = Behavior.abTestReadout(spark, sf).head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(na + nb == users)
    val (ca, cb) = (r.getAs[Long]("c_a"), r.getAs[Long]("c_b"))
    assert(ca <= na && cb <= nb)
    val lift = r.getAs[Double]("lift"); val z = r.getAs[Double]("z_stat")
    assert(lift.sign == z.sign || lift == 0.0)
    assert(math.abs(r.getAs[Double]("rate_a") - ca.toDouble / na) < 1e-5)
  }

  test("fixed-size sample: exactly k docs, stable, priority-ordered") {
    val a = graft.operators.TextAnalysis.fixedSizeSample(spark, sf).collect()
    val b = graft.operators.TextAnalysis.fixedSizeSample(spark, sf).collect()
    assert(a.length == 25 && a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    val prios = a.map(_.getString(1))
    assert(prios.toSeq == prios.sorted.toSeq)
  }

  test("cusum: series ends near zero and stays bounded on stationary data") {
    val rows = graft.operators.Quality.cusumHourly(spark, sf).collect()
    assert(rows.nonEmpty)
    // sum of deviations over the full series is ~0 by construction
    // (up to the 1e-6 per-term rounding)
    val last = rows.last.getAs[Double]("cusum")
    assert(math.abs(last) < rows.length * 1e-5, s"cusum does not close: $last")
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == Tables.events(spark, sf).count())
  }

  test("per-source heavy hitters: 3 ranked tokens per source, counts consistent") {
    val rows = graft.operators.TextAnalysis.topTokensPerSource(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, grp) =>
      assert(grp.length <= 3)
      val ns = grp.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("n"))
      assert(ns.toSeq == ns.sortBy(-_).toSeq)
    }
  }

  test("group top-k plans through WindowGroupLimit") {
    val df = Relational.topOrdersPerSegment(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected native rank-pushdown node in plan:\n${plan.take(1500)}")
    val rows = df.collect()
    rows.groupBy(_.getString(0)).foreach { case (_, grp) =>
      assert(grp.length <= 3)
      val prices = grp.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("o_totalprice"))
      assert(prices.toSeq == prices.sortBy(-_).toSeq)
    }
  }
}
