package graft

import org.apache.spark.sql.functions._
import graft.operators.{Behavior, Quality, Stats}

/** Round-8 part 4: trend/survival/forensic diagnostics + path mining —
  * each gate checked against an in-test brute-force replica on the
  * (small) sf0.001 data, independent of the DuckDB oracle.
  */
class Round8dSpec extends SparkSpec {

  test("mkt1: S and Theil-Sen slope match the brute pairwise replica") {
    val r = Stats.mannKendallTrend(spark, sf).head()
    val series = Tables.orders(spark, sf)
      .groupBy(expr("CAST(datediff(to_date(o_orderdate), '1970-01-01') AS BIGINT)")
        .as("di"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    assert(r.getAs[Long]("n_days") == series.length)
    var s = 0L
    val slopes = collection.mutable.ArrayBuffer[Double]()
    for (i <- series.indices; j <- (i + 1) until series.length) {
      val d = java.lang.Long.compare(series(j)._2, series(i)._2)
      s += d
      slopes += (series(j)._2 - series(i)._2).toDouble / 100.0 /
        (series(j)._1 - series(i)._1).toDouble
    }
    assert(r.getAs[Long]("s_stat") == s)
    // Interpolated median, the percentile/quantile_cont definition.
    val sorted = slopes.sorted
    val pos = 0.5 * (sorted.length - 1)
    val lo = sorted(pos.toInt)
    val hi = sorted(math.ceil(pos).toInt)
    val med = lo + (hi - lo) * (pos - pos.toInt)
    assert(math.abs(r.getAs[Double]("theil_sen_slope") - med) < 1e-6)
    assert(!r.getAs[Double]("z_score").isNaN)
  }

  test("ben1: digits match string extraction; shares sum to 1") {
    val rows = Quality.benfordDigits(spark, sf).collect()
    val brute = Tables.orders(spark, sf)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .collect().map(_.getLong(0)).filter(_ > 0)
      .groupBy(c => c.toString.head.asDigit.toLong)
      .view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet))
    rows.foreach { rr =>
      assert(rr.getAs[Long]("n_obs") == brute(rr.getAs[Long]("digit")))
    }
    assert(math.abs(rows.map(_.getAs[Double]("obs_share")).sum - 1.0) < 1e-4)
    // Benford expectation for digit 1 is log10(2) ~ 0.30103.
    val d1 = rows.find(_.getAs[Long]("digit") == 1L).get
    assert(math.abs(d1.getAs[Double]("exp_share") - 0.30103) < 1e-5)
  }

  test("sur1: product-limit curve matches a driver-side KM replica") {
    val rows = Behavior.kaplanMeier(spark, sf).collect()
    val perUser = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        (col("event_type") === "purchase").as("p"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2)))
      .groupBy(_._1).toSeq.map { case (_, es) =>
        val t0 = es.map(_._2).min
        val tp = es.filter(_._3).map(_._2).minOption
        val dur = tp.getOrElse(es.map(_._2).max) - t0
        (dur / 3600000000L, tp.isDefined)
      }
    val n = perUser.size.toLong
    val life = perUser.groupBy(_._1).toSeq.sortBy(_._1).map { case (h, xs) =>
      (h, xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }
    var atRisk = n
    var surv = 1.0
    life.foreach { case (h, d, c) =>
      surv *= 1.0 - d.toDouble / atRisk.toDouble
      val row = rows.find(_.getAs[Long]("dur_h") == h).get
      assert(row.getAs[Long]("n_risk") == atRisk)
      assert(row.getAs[Long]("d_events") == d)
      assert(row.getAs[Long]("c_censored") == c)
      assert(math.abs(row.getAs[Double]("survival") - surv) < 1e-4)
      atRisk -= d + c
    }
    // Survival is non-increasing down the curve.
    val curve = rows.sortBy(_.getAs[Long]("dur_h")).map(_.getAs[Double]("survival"))
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("edr1: centroid cosine/l2 match the brute slice replica") {
    val rows = graft.operators.VectorOps.embeddingDrift(spark, sf).collect()
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    val byKey = vecs.groupBy(v => (v._2, v._1 % 2 == 0))
    def cent(label: Int, ref: Boolean): Array[Double] = {
      val g = byKey((label, ref)).map(_._3)
      val d = g.head.length
      Array.tabulate(d)(i => g.map(_(i).toDouble).sum / g.length)
    }
    rows.foreach { r =>
      val l = r.getAs[Int]("label")
      val (cr, cc) = (cent(l, ref = true), cent(l, ref = false))
      val dot = cr.zip(cc).map { case (a, b) => a * b }.sum
      val nr = math.sqrt(cr.map(x => x * x).sum)
      val nc = math.sqrt(cc.map(x => x * x).sum)
      assert(r.getAs[Long]("n_ref") == byKey((l, true)).length)
      assert(r.getAs[Long]("n_cand") == byKey((l, false)).length)
      assert(math.abs(r.getAs[Double]("centroid_cos") - dot / (nr * nc)) < 1e-6)
      assert(math.abs(r.getAs[Double]("norm_ref") - nr) < 1e-6)
      val l2 = math.sqrt(cr.zip(cc).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(math.abs(r.getAs[Double]("centroid_l2") - l2) < 1e-6)
      // Cosine is a valid similarity (tiny sf0.001 slices are noisy,
      // so no closeness claim — the 1e-6 replica checks above are the
      // correctness assertion).
      assert(math.abs(r.getAs[Double]("centroid_cos")) <= 1.0 + 1e-9)
    }
  }

  test("ltv1: cumulative revenue per cohort matches the brute replica") {
    val rows = graft.operators.Behavior.cohortLtv(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "to_date(ts) AS day",
        "CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS rev")
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val cohortOf = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = cohortOf.values.groupBy(identity).view.mapValues(_.size).toMap
    val daily = ev.groupBy(e => (cohortOf(e._1),
        java.time.temporal.ChronoUnit.DAYS.between(cohortOf(e._1), e._2)))
      .view.mapValues(_.map(_._3).sum).toMap
    rows.foreach { r =>
      val cohort = java.time.LocalDate.parse(r.getAs[String]("cohort_day"))
      val off = r.getAs[Int]("day_offset")
      assert(off <= 7)
      assert(r.getAs[Long]("n_users") == sizes(cohort).toLong)
      val cum = (0 to off).map(o => daily.getOrElse((cohort, o.toLong), 0.0)).sum
      assert(math.abs(r.getAs[Double]("ltv_per_user") - cum / sizes(cohort)) < 1e-4)
    }
    // Per cohort, the curve is non-decreasing in the offset.
    rows.groupBy(_.getAs[String]("cohort_day")).values.foreach { g =>
      val curve = g.sortBy(_.getAs[Int]("day_offset")).map(_.getAs[Double]("ltv_per_user"))
      assert(curve.zip(curve.tail).forall { case (x, y) => y >= x - 1e-9 })
    }
  }

  test("vj1: pairwise vocabulary Jaccard matches the brute set replica") {
    val rows = graft.operators.TextAnalysis.vocabOverlap(spark, sf).collect()
    val vocab = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(_.flatMap(_._2.trim.split("\\s+")).toSet).toMap
    assert(rows.length == vocab.size * (vocab.size - 1) / 2)
    rows.take(30).foreach { r =>
      val (sa, sb) = (r.getAs[String]("sa"), r.getAs[String]("sb"))
      val (a, b) = (vocab(sa), vocab(sb))
      val inter = (a & b).size
      assert(r.getAs[Long]("n_a") == a.size && r.getAs[Long]("n_b") == b.size)
      assert(r.getAs[Long]("n_common") == inter)
      assert(math.abs(r.getAs[Double]("jaccard")
        - inter.toDouble / (a.size + b.size - inter)) < 1e-6)
      assert(math.abs(r.getAs[Double]("containment")
        - inter.toDouble / math.min(a.size, b.size)) < 1e-6)
    }
  }

  test("wfn1: deadline-bounded conversion matches the brute replica") {
    val r = graft.operators.Behavior.windowedConversion(spark, sf).head()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    val byUser = ev.groupBy(_._1)
    val clicked = byUser.flatMap { case (_, es) =>
      es.filter(_._3 == "click").map(_._2).minOption
        .map(c0 => (c0, es.filter(e => e._3 == "purchase" && e._2 >= c0)
          .map(_._2 - c0).minOption))
    }.toSeq
    val conv = clicked.flatMap(_._2).filter(_ <= 172800000000L)
    assert(r.getAs[Long]("n_clicked") == clicked.size)
    assert(r.getAs[Long]("n_converted") == conv.size)
    assert(math.abs(r.getAs[Double]("conversion_rate")
      - conv.size.toDouble / clicked.size) < 1e-6)
    if (conv.isEmpty) {
      // No converter inside the deadline at this SF: the mean is NULL
      // on both engines (the gate hash covers the agreement).
      assert(r.isNullAt(r.fieldIndex("mean_minutes_to_convert")))
    } else {
      assert(math.abs(r.getAs[Double]("mean_minutes_to_convert")
        - conv.map(BigDecimal(_)).sum.toDouble / conv.size / 60000000.0) < 1e-4)
    }
  }

  test("dd17: shared-fingerprint pairs match the brute winnow replica") {
    val rows = graft.operators.Dedup.winnowDupPairs(spark, sf).collect()
    assert(rows.nonEmpty, "the salted corpus must contain near-dup pairs")
    // Brute replica of the full chain over the collected fps frame.
    val fps = graft.operators.TextAnalysis
      .winnowFrom(Tables.documents(spark, sf)
        .select(col("doc_id"),
          graft.operators.TextAnalysis.words(col("text")).as("ws")))
      .select(col("doc_id"), col("fps")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    val df = fps.values.toSeq.flatten.groupBy(identity).view.mapValues(_.size).toMap
    def capped(d: Long): Set[Long] = fps(d).filter(df(_) <= 16)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val shared = (capped(a) & capped(b)).size
      assert(r.getAs[Long]("n_shared") == shared && shared >= 2)
      assert(r.getAs[Long]("n_a") == fps(a).size)
      assert(math.abs(r.getAs[Double]("containment")
        - shared.toDouble / math.min(fps(a).size, fps(b).size)) < 1e-6)
    }
    // Completeness: every qualifying pair is present.
    val ids = fps.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if (capped(ids(i)) & capped(ids(j))).size >= 2
    } yield (ids(i), ids(j))).toSet
    assert(rows.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet == expected)
  }

  test("path1: trigram counts match the brute per-user replica") {
    val rows = Behavior.sessionPaths(spark, sf).collect()
    val brute = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
      .groupBy(_._1).values.flatMap { es =>
        val seq = es.sortBy(e => (e._2, e._3)).map(_._4)
        seq.sliding(3).filter(_.length == 3).map(_.mkString(">"))
      }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.length == math.min(25, brute.size))
    rows.foreach { rr =>
      assert(brute(rr.getAs[String]("path")) == rr.getAs[Long]("n"))
    }
    // The returned set IS the top-25 by (n desc, path asc).
    val expected = brute.toSeq.sortBy { case (p, c) => (-c, p) }.take(25)
      .map(_._1).toSet
    assert(rows.map(_.getAs[String]("path")).toSet == expected)
  }
}
