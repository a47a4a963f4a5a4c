package graft

import org.apache.spark.sql.functions._
import graft.operators.{LanguageModel, Quality, Stats}

/** Round-8 part 5: rank correlation, changepoint, classical
  * decomposition, and Naive Bayes — each gate checked against an
  * in-test brute-force replica on the sf0.001 data, independent of
  * the DuckDB oracle.
  */
class Round8eSpec extends SparkSpec {

  test("spear1: rho matches brute Pearson over average ranks") {
    val r = Stats.spearmanCorr(spark, sf).head()
    val pts = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice").cast("double"),
        col("l_quantity").cast("double"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1)))
    def avgRanks(vs: Array[Double]): Array[Double] = {
      val sorted = vs.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](vs.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j + 1 < sorted.length && sorted(j + 1)._1 == sorted(i)._1) j += 1
        val avg = (i + 1 + j + 1) / 2.0
        (i to j).foreach(k => out(sorted(k)._2) = avg)
        i = j + 1
      }
      out
    }
    val ra = avgRanks(pts.map(_._1))
    val rb = avgRanks(pts.map(_._2))
    val n = pts.length.toDouble
    val (sa, sb) = (ra.sum, rb.sum)
    val sab = ra.zip(rb).map { case (a, b) => a * b }.sum
    val saa = ra.map(a => a * a).sum
    val sbb = rb.map(b => b * b).sum
    val rho = (n * sab - sa * sb) /
      (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
    assert(r.getAs[Long]("n") == pts.length)
    assert(math.abs(r.getAs[Double]("spearman_rho") - rho) < 1e-6)
  }

  test("cpd1: per-type changepoint matches the brute split scan") {
    val rows = Quality.changepointHourly(spark, sf).collect()
    assert(rows.nonEmpty)
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("h"))
      .agg(count(lit(1)).as("y"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._2, t._3)).toArray).toMap
    rows.foreach { r =>
      val series = hourly(r.getAs[String]("event_type"))
      val ys = series.map(_._2)
      val nh = ys.length
      val st = ys.sum.toDouble
      val st2 = ys.map(y => y * y).sum.toDouble
      val sse0 = st2 - st * st / nh
      var best = (Double.MaxValue, "")
      var cs = 0L; var cs2 = 0L
      for (i <- 1 until nh) {
        cs += ys(i - 1); cs2 += ys(i - 1) * ys(i - 1)
        val sse = (cs2 - cs.toDouble * cs / i) +
          ((st2 - cs2) - (st - cs) * (st - cs) / (nh - i))
        if (sse < best._1 || (sse == best._1 && series(i - 1)._1 < best._2))
          best = (sse, series(i - 1)._1)
      }
      assert(r.getAs[String]("change_hour") == best._2)
      assert(math.abs(r.getAs[Double]("sse_drop") - (sse0 - best._1)) < 1e-4)
    }
  }

  test("stl1: seasonal indices match the brute decomposition and sum to ~0") {
    val rows = Quality.classicalDecomposition(spark, sf).collect()
    assert(rows.length == 24)
    val hourly = Tables.events(spark, sf)
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("h"))
      .agg(count(lit(1)).as("y"))
      .collect().map(x => (x.getString(0), x.getLong(1))).sortBy(_._1)
    val n = hourly.length
    val byHod = collection.mutable.Map[Long, List[Double]]()
    for (i <- 12 until (n - 12)) {
      // centered 24-term MA: rows i-12..i+11 and i-11..i+12, halved
      val t48 = (i - 12 to i + 11).map(j => hourly(j)._2).sum +
        (i - 11 to i + 12).map(j => hourly(j)._2).sum
      val hod = hourly(i)._1.substring(11, 13).toLong
      byHod(hod) = (hourly(i)._2 * 48.0 - t48) / 48.0 :: byHod.getOrElse(hod, Nil)
    }
    val raw = byHod.view.mapValues(v => v.sum / v.size).toMap
    val mean = raw.values.sum / raw.size
    rows.foreach { r =>
      val hod = r.getAs[Long]("hod")
      assert(math.abs(r.getAs[Double]("seasonal") - (raw(hod) - mean)) < 1e-4)
      assert(r.getAs[Long]("n_hours") == byHod(hod).size)
    }
    assert(math.abs(rows.map(_.getAs[Double]("seasonal")).sum) < 1e-3)
  }

  test("nb1: confusion matrix matches the brute NB replica") {
    val rows = LanguageModel.naiveBayesConfusion(spark, sf).collect()
    assert(rows.nonEmpty)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").toSeq))
    val (train, test) = docs.partition(d => md5hex(d._1.toString) < "cccccccc")
    val cls = train.groupBy(_._2).view.mapValues(_.map(_._3.size).sum.toLong).toMap
    val vocab = train.flatMap(_._3).distinct.length.toLong
    val cnt = train.flatMap(d => d._3.map(w => (d._2, w)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val prior = train.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ptot = train.length.toDouble
    val confusion = collection.mutable.Map[(String, String), Long]()
    test.foreach { case (_, trueLang, ws) =>
      val tf = ws.groupBy(identity).view.mapValues(_.size).toMap
      val scored = cls.keys.toSeq.sorted.map { cand =>
        val ll = tf.map { case (w, f) =>
          BigDecimal(f * math.log(
            (cnt.getOrElse((cand, w), 0L) + 1.0) / (cls(cand) + vocab)))
            .setScale(8, BigDecimal.RoundingMode.HALF_UP)
        }.sum + BigDecimal(math.log(prior(cand) / ptot))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)
        (cand, ll)
      }
      val pred = scored.maxBy { case (cand, ll) => (ll, cand) }(
        Ordering.Tuple2(Ordering[BigDecimal], Ordering[String].reverse))._1
      confusion((trueLang, pred)) = confusion.getOrElse((trueLang, pred), 0L) + 1
    }
    assert(rows.map(r => ((r.getAs[String]("true_lang"),
      r.getAs[String]("pred_lang")), r.getAs[Long]("n"))).toMap == confusion.toMap)
  }
}
