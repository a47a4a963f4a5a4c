package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quality, Relational, TextAnalysis}

class MixDriftReportSpec extends SparkSpec {

  test("temperature mixture: weights normalize and compress shares toward uniform") {
    val rows = TextAnalysis.temperatureMixture(spark, sf).collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum to $wsum")
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      val weight = r.getAs[Double]("weight")
      // T=2 pulls every source toward uniform: tail sources gain,
      // head sources shed
      val uniform = 1.0 / rows.length
      if (share < uniform) assert(weight > share, s"tail source lost mass: $r")
      if (share > uniform) assert(weight < share, s"head source gained mass: $r")
    }
  }

  test("mixture sample: realizes the temperature budget per source, no window, broadcast select") {
    val out = TextAnalysis.mixtureSample(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // deterministic: an identical second run selects the identical docs
    assert(TextAnalysis.mixtureSample(spark, sf).collect().map(_.getLong(0)).toSeq
      == rows.map(_.getLong(0)).toSeq)
    // each source's selected token mass approximates its temperature
    // budget share: expected tokens = B·w_s/Z; md5 is uniform, so a
    // 3× band catches a wrong threshold (off by source size or Z)
    // without flaking on sampling noise at sf0.001
    val docs = Tables.documents(spark, sf)
      .select(col("source"), size(TextAnalysis.words(col("text"))).cast("long").as("n"))
      .groupBy("source").agg(sum(col("n")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.values.sum
    val budget = total / 5
    val wq = docs.view.mapValues(n =>
      math.floor(math.round(math.sqrt(n.toDouble / total) * 1e8).toDouble)).toMap
    val z = wq.values.sum
    val picked = rows.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    docs.keys.foreach { src =>
      val expect = budget * wq(src) / z
      val got = picked.getOrElse(src, 0L).toDouble
      assert(got < expect * 3,
        s"$src: selected $got tokens vs expected ~$expect")
    }
    // a single source CAN deterministically miss at sf0.001 (src2's
    // 25 md5 fractions all sit above its ~0.2 rate — verified against
    // the oracle), but most must land
    val landed = docs.keys.count(s => picked.getOrElse(s, 0L) > 0)
    assert(landed * 5 >= docs.size * 4,
      s"only $landed/${docs.size} sources selected anything")
    // total selected stays near the 20% budget
    val sel = rows.map(_.getLong(2)).sum.toDouble
    assert(sel > budget / 2 && sel < budget * 2, s"selected $sel vs budget $budget")
    // scale shape: Bernoulli-by-rate — a broadcast join and NO window
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), "mixture sample must not sort per source")
    assert(plan.contains("BroadcastHashJoin"), "threshold join must broadcast")
  }

  test("psi drift: same-distribution halves stay under the 0.1 threshold") {
    val rows = Quality.psiDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val psi = rows.map(_.getAs[Double]("psi_term")).sum
    assert(psi >= 0 && psi < 0.1, s"parity split PSI unexpectedly high: $psi")
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("p") - r.getAs[Double]("q")) < 0.2)
      assert(r.getAs[Boolean]("one_sided") ==
        (r.getAs[Long]("n_ref") == 0L || r.getAs[Long]("n_cur") == 0L))
    }
  }

  test("dp3 noised counts: deterministic, bounded, and not an identity release") {
    val a = Quality.dpNoisedCounts(spark, sf).collect()
    val b = Quality.dpNoisedCounts(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "release must be reproducible")
    a.foreach { r =>
      val noise = r.getAs[Double]("n_noised") - r.getAs[Long]("n")
      // Laplace(b=2): P(|x| > 20) = e^{-10} — a violation means the
      // inverse-CDF transform is broken, not bad luck
      assert(math.abs(noise) < 20.0, s"implausible noise $noise for $r")
    }
    assert(a.exists(r => r.getAs[Double]("n_noised") != r.getAs[Long]("n").toDouble),
      "at least one released count must actually be perturbed")
  }

  test("psi drift: one-sided bins survive the outer join, flagged and finite") {
    import spark.implicits._
    val dir = tmpDir("psi_onesided")
    // even event_ids land in the reference half; value 950 puts one
    // ref-only row in bin 9, which an inner join would silently drop
    val ns = 1700000000000000000L
    Seq((0L, 5.0, ns), (1L, 5.0, ns), (2L, 5.0, ns), (3L, 5.0, ns),
        (4L, 950.0, ns))
      .toDF("event_id", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Quality.psiDrift(spark, dir).collect()
    val bins = out.map(r => r.getAs[Int]("bin") -> r).toMap
    assert(bins.contains(9), "ref-only bin must survive the outer join")
    val b9 = bins(9)
    assert(b9.getAs[Boolean]("one_sided"))
    assert(b9.getAs[Long]("n_cur") == 0L && b9.getAs[Long]("n_ref") == 1L)
    assert(b9.getAs[Double]("q") == 0.0)
    val t = b9.getAs[Double]("psi_term")
    assert(!t.isNaN && !t.isInfinite && t > 0.0,
      s"one-sided PSI term must be finite and positive, got $t")
    assert(!bins(0).getAs[Boolean]("one_sided"))
  }

  test("pmi collocations: the BPE step-1 merge pair appears with positive PMI") {
    val rows = TextAnalysis.pmiCollocations(spark, sf).collect()
    assert(rows.nonEmpty)
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.toSeq == pmis.sortBy(-_).toSeq)
    assert(rows.forall(_.getAs[Long]("c12") >= 5))
    // the corpus's strongest merge candidate should be a collocation too
    val top = TextAnalysis.bpeTrain(spark, sf, steps = 1).head
    val pairSet = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairSet.contains((top.getString(1), top.getString(2))) ||
      pmis.head > 0, "top merge pair absent and no positive-PMI pair found")
  }

  test("correlation matrix: 6 pairs, values in [-1,1], symmetric to x9") {
    val rows = Relational.corrMatrix(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr out of range: $r")
    }
    val qtyPrice = rows.find(r =>
      r.getString(0) == "price" && r.getString(1) == "qty").get.getAs[Double]("corr")
    val x9 = Relational.quantityPriceCorr(spark, sf).head.getAs[Double]("corr_qty_price")
    assert(math.abs(qtyPrice - x9) < 1e-6, s"matrix $qtyPrice vs x9 $x9")
  }

  test("mad outliers: robust stats bounded and flag a minority of rows") {
    val rows = Quality.madOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (med, mad) = (r.getAs[Double]("med"), r.getAs[Double]("mad"))
      val (n, out) = (r.getAs[Long]("n"), r.getAs[Long]("n_outliers"))
      assert(mad >= 0 && med > 0)
      assert(out >= 0 && out < n / 4,
        s"MAD flagged >25% of ${r.getString(0)} as outliers — not robust")
    }
  }

  test("markov transitions: rows per prev sum to 1, transitions conserve events") {
    val rows = graft.operators.Behavior.markovTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (prev, grp) =>
      val psum = grp.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-3, s"P(.|$prev) sums to $psum")
    }
    val nTrans = rows.map(_.getAs[Long]("n")).sum
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(nTrans == nEvents - nUsers,
      s"transitions $nTrans != events $nEvents - users $nUsers")
  }

  test("frequent pairs: supports ranked, min respected, pairs canonical") {
    val rows = Relational.frequentItemPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val sup = rows.map(_.getAs[Long]("support"))
    assert(sup.toSeq == sup.sortBy(-_).toSeq && sup.forall(_ >= 3))
    assert(rows.forall(r => r.getAs[Long]("part_a") < r.getAs[Long]("part_b")))
  }

  test("feature hashing: dims bounded, counts reconstruct token totals") {
    val rows = TextAnalysis.featureHashing(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val d = r.getAs[Int]("dim"); d >= 0 && d < 32 })
    val hashedTotals = rows.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    Tables.documents(spark, sf).filter(col("doc_id") < 10)
      .select(col("doc_id"), size(TextAnalysis.words(col("text"))).as("nw"))
      .collect().foreach { r =>
        assert(hashedTotals(r.getLong(0)) == r.getInt(1).toLong,
          s"doc ${r.getLong(0)}: hashed mass != token count")
      }
  }

  test("q10 returned items: revenue ranks desc and only quarter orders count") {
    val rows = Relational.returnedItemReport(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.toSeq == revs.sortBy(-_).toSeq)
    assert(revs.forall(_ > 0))
  }
}
