package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{Decontamination, Ingest, Quality, Relational, TextAnalysis}

/** Round-8 widening, part 2: k-fold CV stats (cv1), time-weighted
  * averages (twa1), dow×hod seasonal matrix (ts4), group-median
  * imputation (imp1), Bloom-prefiltered decontamination (dc3) and the
  * BloomBank kernel behind it, TxTable snapshot diff (ttd1).
  */
class Round8bSpec extends SparkSpec {

  // ---- cv1 k-fold stats ------------------------------------------

  test("cv1: folds partition the corpus and complements are exact") {
    val rows = TextAnalysis.kfoldStats(spark, sf).collect()
    assert(rows.length == 5)
    val total = Tables.documents(spark, sf).count()
    val totalChars = Tables.documents(spark, sf)
      .agg(sum(col("n_chars"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    assert(rows.map(_.getAs[Long]("fold_chars")).sum == totalChars)
    rows.foreach { r =>
      assert(r.getAs[Long]("train_docs") == total - r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("train_chars") ==
        totalChars - r.getAs[Long]("fold_chars"))
    }
  }

  // ---- twa1 time-weighted average --------------------------------

  test("twa1: hand-computed interval weighting on a crafted stream") {
    import spark.implicits._
    val dir = tmpDir("twa1_")
    // User 1, one hour: value 10 held 60 s, value 20 held 120 s,
    // value 30 held 60 s, then a terminal event (open tail, dropped).
    // TWA = (10*60 + 20*120 + 30*60) / 240 = 4800/240 = 20.0
    val base = 1700000000000L // 2023-11-14 22:13:20 UTC
    val ev = Seq(
      (1L, new Timestamp(base), 1L, "x", 10.0, "{}"),
      (2L, new Timestamp(base + 60000L), 1L, "x", 20.0, "{}"),
      (3L, new Timestamp(base + 180000L), 1L, "x", 30.0, "{}"),
      (4L, new Timestamp(base + 240000L), 1L, "x", 99.0, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = Relational.timeWeightedAverage(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("total_ms") == 240000L)
    assert(rows.head.getAs[Double]("twa_value") == 20.0)
  }

  test("twa1: caps any interval at one hour") {
    import spark.implicits._
    val dir = tmpDir("twa1cap_")
    val base = 1700000000000L
    // 3 events 2h apart -> two closed intervals, each capped at 3600000.
    val ev = (0 to 3).map(i =>
      (i.toLong, new Timestamp(base + i * 7200000L), 1L, "x", 10.0 * (i + 1), "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = Relational.timeWeightedAverage(spark, dir).collect()
    // Each event starts its own hour bucket; cnt>=3 filters them out.
    assert(rows.isEmpty)
  }

  // ---- ts4 dow × hod profile -------------------------------------

  test("ts4: cells are calendar-valid and means sit inside value range") {
    val rows = Relational.dowHodProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    val (lo, hi) = {
      val r = Tables.events(spark, sf)
        .agg(min(col("value")), max(col("value"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
    rows.foreach { r =>
      assert(r.getAs[Int]("dow") >= 0 && r.getAs[Int]("dow") <= 6)
      assert(r.getAs[Int]("hod") >= 0 && r.getAs[Int]("hod") <= 23)
      assert(r.getAs[Long]("n") >= 5)
      val m = r.getAs[Double]("mean_value")
      assert(m >= lo && m <= hi)
      assert(r.getAs[Double]("var_value") >= 0.0)
    }
  }

  // ---- imp1 median imputation ------------------------------------

  test("imp1: imputed counts match the mask and medians are observed values") {
    val rows = Quality.medianImpute(spark, sf).collect()
    val cust = Tables.customer(spark, sf)
    val expectedImputed = cust.filter(col("c_custkey") % 7 === 0)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("n")).toMap
    val observed = cust.filter(col("c_custkey") % 7 =!= 0)
      .select(col("c_nationkey"), col("c_acctbal")).collect()
      .groupBy(_.getInt(0)).map { case (k, v) => k -> v.map(_.getDouble(1)).toSet }
    rows.foreach { r =>
      val nk = r.getAs[Int]("c_nationkey")
      assert(r.getAs[Long]("n_imputed") == expectedImputed.getOrElse(nk, 0L))
      // lower median by exact rank IS one of the observed balances
      assert(observed(nk).contains(r.getAs[Double]("grp_median")),
        s"median of nation $nk is not an observed value")
    }
  }

  // ---- dc3 Bloom-prefiltered decontamination ---------------------

  test("dc3: Bloom path is byte-identical to the exact overlap join") {
    val viaBloom = Decontamination.bloomPrefilteredOverlap(spark, sf).collect()
    // Exact reference: same grams, plain semi join, no sketch.
    val n = 7
    val grams = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.operators.TextAnalysis.words(col("text")).as("ws"))
      .select(col("doc_id"),
        explode(when(size(col("ws")) >= n,
          transform(sequence(lit(0), size(col("ws")) - lit(n)),
            i => concat_ws(" ", slice(col("ws"), i + lit(1), lit(n)))))
          .otherwise(array().cast("array<string>"))).as("gram"))
      .select(col("doc_id"), col("gram")).distinct()
    val isEval = col("doc_id") % 10 === 7
    val train = grams.filter(!isEval).select(col("gram")).distinct()
    val exact = grams.filter(isEval)
      .join(train, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
      .join(grams.filter(isEval).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams")), Seq("doc_id"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"))
      .orderBy(col("doc_id")).collect()
    assert(viaBloom.map(_.toSeq).toSeq == exact.map(_.toSeq).toSeq)
  }

  test("BloomBank kernel: no false negatives, bounded false positives") {
    import spark.implicits._
    val keys = (0L until 500L).map(k => s"key_$k")
    val df = keys.toDF("g")
      .withColumn("bucket", pmod(xxhash64(col("g")), lit(4L)))
    val rows = df.groupBy(col("bucket"))
      .agg(graft.functions.BloomFns.bloomAgg(col("g"), 10000L, 80000L).as("b"))
      .collect()
    val bank = Array.fill[Array[Byte]](4)(null)
    rows.foreach(r => bank(r.getLong(0).toInt) = r.getAs[Array[Byte]](1))
    assert(bank.forall(_ != null))
    // every inserted key must pass its bucket's sketch
    val present = df
      .filter(graft.functions.BloomFns.bankContains(bank.toSeq, col("bucket"), col("g")))
      .count()
    assert(present == 500L)
    // absent keys: with 10k capacity for ~125 inserts, fpp is tiny
    val absent = (0L until 2000L).map(k => s"missing_$k").toDF("g")
      .withColumn("bucket", pmod(xxhash64(col("g")), lit(4L)))
      .filter(graft.functions.BloomFns.bankContains(bank.toSeq, col("bucket"), col("g")))
      .count()
    assert(absent <= 10L, s"false-positive burst: $absent of 2000")
  }

  // ---- ttd1 snapshot diff ----------------------------------------

  test("ttd1: classes partition the union of keys and cents reconcile") {
    val rows = Ingest.txVersionDiffGate(spark, sf).collect()
    val byClass = rows.map(r => r.getString(0) ->
      (r.getAs[Long]("n_rows"), r.getAs[Long]("cents_before"),
        r.getAs[Long]("cents_after"))).toMap
    assert(byClass.keySet == Set("added", "removed", "changed", "unchanged"))
    val o = Tables.orders(spark, sf).select(col("o_orderkey").as("k"))
    val nA = o.filter(col("k") % 4 =!= 0).count()
    val nB = o.filter(col("k") % 5 =!= 0).count()
    val nUnion = o.filter(col("k") % 4 =!= 0 || col("k") % 5 =!= 0).count()
    assert(byClass.values.map(_._1).sum == nUnion)
    assert(byClass("added")._2 == 0L)
    assert(byClass("removed")._3 == 0L)
    // a-side totals over removed+changed+unchanged = all of v_a
    assert(byClass("removed")._2 + byClass("changed")._2 + byClass("unchanged")._2 > 0)
    assert(byClass("removed")._1 + byClass("changed")._1 + byClass("unchanged")._1 == nA)
    assert(byClass("added")._1 + byClass("changed")._1 + byClass("unchanged")._1 == nB)
    // changed rows are exactly the F-status survivors: +1000 cents each
    assert(byClass("changed")._3 - byClass("changed")._2 ==
      1000L * byClass("changed")._1)
  }

  // ---- vnt1 variant extraction -----------------------------------

  test("vnt1: the VARIANT path agrees with the from_json path") {
    val viaVariant = Relational.variantExtract(spark, sf).collect()
    val viaStruct = Tables.events(spark, sf)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k").as("k"))
      .groupBy(col("event_type"), expr("k div 25").as("k_bucket"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .orderBy(col("event_type"), col("k_bucket"))
      .collect()
    assert(viaVariant.map(_.toSeq).toSeq == viaStruct.map(_.toSeq).toSeq)
  }

  // ---- q19 disjunctive predicate ---------------------------------

  test("q19: disjunction equals the union of its branches") {
    val whole = Relational.disjunctivePredicateRevenue(spark, sf).head()
    def branch(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
      Tables.lineitem(spark, sf)
        .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === brand && col("p_size").between(szLo, szHi)
          && col("l_quantity").between(qLo, qHi))
        .count()
    // branches are disjoint on p_brand, so counts add exactly
    assert(whole.getAs[Long]("n_items") ==
      branch("Brand#1", 1, 15, 1, 20) + branch("Brand#3", 10, 30, 15, 40))
    assert(whole.getAs[Double]("revenue") > 0.0)
  }

  test("q19: part-side predicates reach the dim scan") {
    val plan = Relational.disjunctivePredicateRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    // The disjunctive brand/size filter must sit on the part relation
    // (pushed below the join), not only in a post-join residual.
    assert(plan.contains("PushedFilters") || plan.contains("Filter"),
      s"no pushed filter evidence in plan:\n$plan")
    val partScanHasBrand = plan.linesIterator
      .exists(l => l.contains("part.parquet") ||
        (l.contains("Brand#") && l.contains("p_size")))
    assert(partScanHasBrand, s"brand/size predicate not near the part scan:\n$plan")
  }

  // ---- c7 corpus card --------------------------------------------

  test("c7: card invariants — shares in [0,1], totals reconcile, argmax is dominant") {
    val rows = graft.operators.Curation.corpusCard(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    val langCounts = Tables.documents(spark, sf)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      Seq("type_token_ratio", "short_frac", "top_lang_share").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of range: $v")
      }
      // the reported top_lang really has the max count for its source
      val src = r.getString(0)
      val counts = langCounts(src).map(x => x.getString(1) -> x.getAs[Long]("n"))
      val best = counts.map(_._2).max
      assert(counts.toMap.apply(r.getAs[String]("top_lang")) == best)
    }
  }

  // ---- exp1 anomaly contribution ---------------------------------

  test("exp1: excesses reconcile against the peak hour's actual counts") {
    val rows = Quality.anomalyContribution(spark, sf).collect()
    assert(rows.nonEmpty)
    val peakHour = rows.head.getAs[String]("peak_hour")
    assert(rows.forall(_.getAs[String]("peak_hour") == peakHour))
    // the peak hour really is the max-volume hour
    val hourly = Tables.events(spark, sf)
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hr")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(hourly(peakHour) == hourly.values.max)
    // per-type peak counts sum to the peak hour's volume
    assert(rows.map(_.getAs[Long]("peak_n")).sum == hourly(peakHour))
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("excess") -
        (r.getAs[Long]("peak_n") - r.getAs[Double]("mean_hourly_n"))) < 1e-5)
    }
  }

  // ---- q13 / q22 TPC-H shapes ------------------------------------

  test("q13: distribution covers every customer, including zero-order ones") {
    val rows = Relational.orderCountDistribution(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("custdist")).sum ==
      Tables.customer(spark, sf).count())
    // urgent-only customers count as zero, not dropped
    assert(rows.forall(_.getAs[Long]("c_count") >= 0))
  }

  test("q22: every reported customer is above threshold with no big orders") {
    val total = Relational.idleRichCustomers(spark, sf).collect()
      .map(_.getAs[Long]("numcust")).sum
    // recompute directly: above-exact-avg balance, anti join big orders
    val c = Tables.customer(spark, sf)
    val abRow = c.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast("decimal(30,2)")).cast("double").as("s"),
        count(lit(1)).as("n")).head()
    val ab = abRow.getDouble(0) / abRow.getLong(1)
    val expect = c.filter(col("c_acctbal") > ab)
      .join(Tables.orders(spark, sf).filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(total == expect)
  }
}
