package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Stats, TextAnalysis}

/** Round-9 late widening: data-selection / calibration operators.
  * Each distributed greedy (k-center, MMR) is replayed locally from
  * the collected sf0.001 embeddings and must agree step-for-step; the
  * isotonic fit is checked against the PAV invariants (monotone,
  * block-mean-preserving) and a sequential PAV sweep.
  */
class Round9cSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cosRaw(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def cosDist(a: Array[Double], b: Array[Double]): Double =
    round6(1.0 - cosRaw(a, b))

  private def vecs(): Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), operators.VectorOps.toDoubleArray(col("embedding")))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap

  test("ksel1: distributed greedy k-center agrees with a local Gonzalez replay") {
    val v = vecs()
    val k = 8
    // local replay: same rounded distances, same vec_id tiebreak
    var md = v.map { case (id, x) => id -> cosDist(x, v(0L)) }
    val picks = collection.mutable.ListBuffer[(Int, Long, Double)]()
    for (t <- 1 until k) {
      val (cid, r) = md.toSeq.minBy { case (id, d) => (-d, id) }
      picks += ((t, cid, r))
      md = md.map { case (id, d) => id -> math.min(d, cosDist(v(id), v(cid))) }
    }
    picks += ((k, -1L, md.values.max))
    val got = Similarity.kcenterCoreset(spark, sf, k = k).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == picks.toList, s"greedy divergence: ${got.toSeq} vs $picks")
    // structural invariants: radii strictly ordered, centers distinct
    val radii = got.map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      "k-center radii must be non-increasing")
    val centers = got.init.map(_._2)
    assert(centers.distinct.length == centers.length)
  }

  test("mmr1: distributed greedy MMR agrees with a local replay and diversifies") {
    val v = vecs()
    val nq = 5; val pool = 10; val k = 5; val lam = 0.7
    def rel(q: Long, c: Long): Double = round6(cosRaw(v(q), v(c)))
    val got = Similarity.mmrRerank(spark, sf, nQueries = nq, pool = pool, k = k, lambda = lam)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == nq * k)
    for (q <- 0L until nq.toLong) {
      val cand = v.keys.filter(_ != q).toSeq
        .map(c => (c, rel(q, c)))
        .sortBy { case (c, s) => (-s, c) }
        .take(pool)
      val sel = collection.mutable.ListBuffer(cand.head._1)
      for (_ <- 2 to k) {
        val rest = cand.filterNot { case (c, _) => sel.contains(c) }
        val next = rest.map { case (c, s) =>
          val maxsim = sel.map(p => round6(cosRaw(v(c), v(p)))).max
          (c, round6(lam * s - (1.0 - lam) * maxsim))
        }.minBy { case (c, m) => (-m, c) }
        sel += next._1
      }
      val gotQ = got.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
      assert(gotQ == sel.toList, s"query $q: $gotQ vs $sel")
    }
    // diversification: some query must pick a lower-rel candidate early
    val steps2 = got.filter(_._2 == 2)
    assert(steps2.forall { case (_, _, _, r, m) => m <= r + 1e-9 })
  }

  test("iso1: fitted rates are monotone, block-mean preserving, and match a PAV sweep") {
    val rows = Stats.isotonicCalibration(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val fits = rows.map(_._4)
    assert(fits.zip(fits.tail).forall { case (a, b) => a <= b + 1e-9 },
      "isotonic output must be non-decreasing")
    // PAV preserves the weighted total: sum(fit*n) == sum(raw*n) == sum(y)
    val wTot = rows.map { case (_, n, _, f) => f * n }.sum
    val yTot = rows.map { case (_, n, r, _) => r * n }.sum
    assert(math.abs(wTot - yTot) < 1e-2, s"weighted totals differ: $wTot vs $yTot")
    // sequential PAV sweep over the EXACT (n, s) bin stats must
    // reproduce the minimax fit (raw_rate is rounded; recompute).
    val bins = Tables.events(spark, sf)
      .select(least(floor(col("value") / 50), lit(9)).cast("int").as("bin"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
      .orderBy(col("bin")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(bins.map(_._1).toSeq == rows.map(_._1).toSeq)
    val blocks = collection.mutable.ListBuffer[(Long, Long, Int)]() // (n, s, width-in-bins)
    for ((_, n, s) <- bins) {
      blocks += ((n, s, 1))
      while (blocks.length > 1 && {
        val (n1, s1, _) = blocks(blocks.length - 2)
        val (n2, s2, _) = blocks.last
        // pool while mean(prev) >= mean(next): s1/n1 >= s2/n2, integer cross-product
        s1 * n2 >= s2 * n1
      }) {
        val (n2, s2, w2) = blocks.remove(blocks.length - 1)
        val (n1, s1, w1) = blocks.remove(blocks.length - 1)
        blocks += ((n1 + n2, s1 + s2, w1 + w2))
      }
    }
    val fitted = blocks.toSeq.flatMap { case (n, s, w) =>
      Seq.fill(w)(round6(s.toDouble / n.toDouble))
    }
    assert(fitted.length == rows.length)
    assert(fits.toSeq == fitted, s"PAV sweep mismatch: ${fits.toSeq} vs $fitted")
  }

  test("rl2: OR-blocking recovers cross-nation strong matches rl1 cannot reach") {
    val rl1 = operators.Dedup.recordLinkage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val rl2 = operators.Dedup.recordLinkageMultiPass(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rl2.length == rl1.length)
    // pointwise rank dominance: the wider candidate set can only
    // improve (or tie) the score at every rank position
    rl1.map(_._4).zip(rl2.map(_._4)).foreach { case (s1, s2) =>
      assert(s2 >= s1 - 1e-9, s"rl2 rank score regressed: $s2 < $s1")
    }
    val nat = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val snat = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    // at least one top-k pair must cross nations (unreachable for rl1)
    assert(rl2.exists { case (ck, sk, _, _) => nat(ck) != snat(sk) },
      "no cross-nation pair in rl2 top-k — OR-blocking added nothing")
    // every full-agreement rl2 pair is a pass-B candidate by
    // construction (same $10 band) — blocking is complete for strong pairs
    val cb = Tables.customer(spark, sf)
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sb = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), round(col("s_acctbal") * 100).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rl2.filter(_._3 == 3).foreach { case (ck, sk, _, _) =>
      assert(math.floor(cb(ck) / 1000.0) == math.floor(sb(sk) / 1000.0))
    }
  }

  test("ivm2: maintained join view equals a from-scratch rebuild after EVERY round") {
    val tmp = TmpIO.scratchDir("graft_ivm2spec_")
    try {
      val oTx = new sources.TxTable(s"$tmp/o")
      val cTx = new sources.TxTable(s"$tmp/c")
      val o = Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val cust = Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_nationkey"))
      def aggView(j: org.apache.spark.sql.DataFrame) =
        j.groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(30,2)")).as("s"))
      def joined(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
        a.join(b, col("o_custkey") === col("c_custkey"))
      val zero = lit(0).cast("decimal(30,2)")
      var view: org.apache.spark.sql.DataFrame = null
      def absorb(delta: org.apache.spark.sql.DataFrame): Unit = {
        view = view.select(col("c_nationkey"), col("n").as("bn"), col("s").as("bs"))
          .join(delta.select(col("c_nationkey"), col("n").as("dn"), col("s").as("ds")),
            Seq("c_nationkey"), "full_outer")
          .select(col("c_nationkey"),
            (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
            (coalesce(col("bs"), zero) + coalesce(col("ds"), zero))
              .cast("decimal(30,2)").as("s"))
          .localCheckpoint()
      }
      def snap(df: org.apache.spark.sql.DataFrame) =
        df.orderBy(col("c_nationkey")).collect()
          .map(r => (r.getAs[Number](0).longValue, r.getLong(1),
            r.getDecimal(2).toPlainString)).toSeq
      def assertRebuilt(): Unit =
        assert(snap(view) ==
          snap(aggView(joined(oTx.snapshot(spark), cTx.snapshot(spark)))))
      oTx.append(o.filter(col("o_orderkey") % 3 === 0))
      var oSeen = oTx.latestVersion().get
      cTx.append(cust.filter(col("c_custkey") % 2 === 0))
      var cSeen = cTx.latestVersion().get
      view = aggView(joined(oTx.snapshot(spark), cTx.snapshot(spark))).localCheckpoint()
      assertRebuilt()
      oTx.append(o.filter(col("o_orderkey") % 3 === 1))
      val oH2 = oTx.latestVersion().get
      absorb(aggView(joined(
        oTx.readChanges(spark, afterVersion = oSeen, untilVersion = Some(oH2)),
        cTx.snapshot(spark))))
      oSeen = oH2
      assertRebuilt()
      cTx.append(cust.filter(col("c_custkey") % 2 === 1))
      val cH3 = cTx.latestVersion().get
      absorb(aggView(joined(oTx.snapshot(spark),
        cTx.readChanges(spark, afterVersion = cSeen, untilVersion = Some(cH3)))))
      cSeen = cH3
      assertRebuilt()
      oTx.append(o.filter(col("o_orderkey") % 3 === 2))
      val oH4 = oTx.latestVersion().get
      absorb(aggView(joined(
        oTx.readChanges(spark, afterVersion = oSeen, untilVersion = Some(oH4)),
        cTx.snapshot(spark))))
      assertRebuilt()
    } finally {
      TmpIO.deleteRecursively(new java.io.File(tmp))
    }
  }

  test("ppr1: personalized pagerank matches a local quantized replay; mass stays near seeds") {
    val pairs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (c, s) =>
      Seq((s"c$c", s"s$s"), (s"s$s", s"c$c"))
    }
    val nodes = edges.map(_._1).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.length).toMap
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = nodes.filter(n => n.startsWith("c") && n.drop(1).toLong < 10).toSet
    val ns = seeds.size.toDouble
    var pr: Map[String, Double] = nodes.map(n =>
      n -> (if (seeds(n)) 1.0 / ns else 0.0)).toMap
    for (_ <- 1 to 3) {
      val contrib = collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for (n <- nodes; d <- out(n))
        contrib(d) += BigDecimal(pr(n) / deg(n) * 1e14)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      pr = nodes.map(n => n ->
        ((if (seeds(n)) 0.15 / ns else 0.0) + 0.85 * (contrib(n).toDouble / 1e14))).toMap
    }
    val want = pr.toSeq.map { case (n, p) => (n, round6p12(p)) }
      .sortBy { case (n, p) => (-p, n) }.take(25)
    val got = operators.Graph.personalizedPageRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == want, s"ppr divergence:\n$got\nvs\n$want")
    // personalization: total mass ≤ 1 (teleport only feeds seeds) and
    // the top-25 is dominated by the seed neighborhood, not degree
    assert(pr.values.sum <= 1.0 + 1e-9)
    assert(got.map(_._2).sum > 0.5, "top-25 should hold most of the walk mass")
  }

  private def round6p12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("gnn1: two-hop neighbor means match a local replay") {
    val pairs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cb = Tables.customer(spark, sf)
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long"),
        col("c_nationkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue))
    val bal = cb.map(t => t._1 -> t._2).toMap
    val natOf = cb.map(t => t._1 -> t._3).toMap
    val h1 = pairs.groupBy(_._2).map { case (s, es) =>
      val vals = es.map(e => bal(e._1))
      s -> BigDecimal(vals.sum.toDouble / vals.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val h2 = pairs.groupBy(_._1).map { case (c, es) =>
      val vals = es.map(e => h1(e._2))
      c -> round6(vals.sum.toDouble / vals.length)
    }
    val byNation = h2.toSeq.groupBy { case (c, _) => natOf(c) }
      .map { case (nat, xs) =>
        (nat, xs.size.toLong,
          round6(xs.map(x => BigDecimal(x._2)).sum.toDouble / xs.size))
      }.toSeq.sortBy(_._1)
    val got = operators.Graph.gnnNeighborAgg(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == byNation, s"gnn divergence:\n$got\nvs\n$byNation")
  }

  test("conf1: qhat is the exact k-th order statistic and coverage is near 1-alpha") {
    val got = operators.Stats.conformalCalibration(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("vc"),
        (col("event_id") % 2).as("half"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((t, ncal, qhat, nTest, coverage) <- got) {
      val calVals = raw.filter(r => r._1 == t && r._3 == 0L).map(_._2).sorted
      assert(calVals.length.toLong == ncal)
      // replay the median the way the engine defines it (quantile_cont)
      val n = calVals.length
      val h = 0.5 * (n - 1)
      val lo = calVals(h.toInt).toDouble
      val hi = calVals(math.ceil(h).toInt).toDouble
      val med = round6(lo + (h - math.floor(h)) * (hi - lo))
      val scores = calVals.map(v =>
        BigDecimal(math.abs(v - med)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        .sorted
      val k = math.ceil((ncal + 1) * 0.9).toLong.toInt
      assert(scores(k - 1) == qhat,
        s"$t: qhat $qhat is not the $k-th order statistic ${scores(k - 1)}")
      // split-conformal guarantee is 1-alpha in expectation; allow
      // sampling slack but require it lands in a sane band
      assert(coverage > 0.8 && coverage <= 1.0, s"$t coverage $coverage")
      assert(nTest > 0)
    }
  }

  test("dsir1: per-source weights match a local token-count replay") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val dims = 64
    def bucket(w: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.substring(0, 6), 16) % dims).toInt
    }
    val toks = docs.flatMap { case (id, src, lang, text) =>
      text.trim.split("\\s+").map(w => (id, src, lang, bucket(w)))
    }
    val rc = toks.groupBy(_._4).view.mapValues(_.length.toLong).toMap
    val tc = toks.filter(_._3 == "en").groupBy(_._4).view.mapValues(_.length.toLong).toMap
    val nr = rc.values.sum; val nt = tc.values.sum
    val lw: Map[Int, BigDecimal] = rc.map { case (b, cr) =>
      val ct = tc.getOrElse(b, 0L)
      val raw = math.log(((ct + 1).toDouble * (nr + dims).toDouble) /
        ((cr + 1).toDouble * (nt + dims).toDouble))
      b -> BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val perDoc = toks.groupBy(t => (t._1, t._2)).map { case ((id, src), ts) =>
      (id, src, ts.map(t => lw(t._4)).sum)
    }
    val bySource = perDoc.groupBy(_._2).map { case (src, ds) =>
      (src, ds.size.toLong,
        BigDecimal(ds.map(_._3).sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        ds.count(_._3 > 0).toLong)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.dsirWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == bySource, s"dsir divergence:\n$got\nvs\n$bySource")
  }
}
