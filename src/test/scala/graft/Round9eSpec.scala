package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-9 continuation widening: Gopher rule battery (t18). The
  * distributed rule evaluation is replayed literally from collected
  * sf0.001 documents using the rule DEFINITIONS (string scans, not
  * the engine's Column algebra), so agreement is evidence the
  * integer-arithmetic restatements are the rules they claim to be.
  */
class Round9eSpec extends SparkSpec {

  test("t18: per-source summaries match a literal per-document rule replay") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))

    case class Acc(var n: Long = 0, var kept: Long = 0, var fWc: Long = 0,
                   var fMwl: Long = 0, var fSym: Long = 0, var fBul: Long = 0,
                   var fEll: Long = 0, var fAlpha: Long = 0, var fStop: Long = 0)
    val acc = collection.mutable.Map[String, Acc]()
    for ((src, text) <- docs) {
      val ws = text.trim.split("\\s+").toSeq
      val lines = text.split("\n", -1).toSeq
      val nWords = ws.size.toLong
      val sumWl = ws.map(_.length.toLong).sum
      val alphaWords = ws.count(_.exists(_.isLetter)).toLong
      val symbols = text.count(_ == '#').toLong +
        "\\.\\.\\.".r.findAllMatchIn(text).size.toLong
      val nLines = lines.size.toLong
      val bullets = lines.count(_.matches("^\\s*[-*•].*")).toLong
      val ell = lines.count(l => l.matches(".*(\\.\\.\\.|…)\\s*$")).toLong
      val stopHits = TextAnalysis.Stopwords.count(ws.contains(_)).toLong
      val rWc = nWords >= 50 && nWords <= 100000
      val rMwl = 3 * nWords <= sumWl && sumWl <= 10 * nWords
      val rSym = 10 * symbols <= nWords
      val rBul = 10 * bullets <= 9 * nLines
      val rEll = 10 * ell <= 3 * nLines
      val rAlpha = 5 * alphaWords >= 4 * nWords
      val rStop = stopHits >= 2
      val a = acc.getOrElseUpdate(src, Acc())
      a.n += 1
      if (rWc && rMwl && rSym && rBul && rEll && rAlpha && rStop) a.kept += 1
      if (!rWc) a.fWc += 1; if (!rMwl) a.fMwl += 1; if (!rSym) a.fSym += 1
      if (!rBul) a.fBul += 1; if (!rEll) a.fEll += 1
      if (!rAlpha) a.fAlpha += 1; if (!rStop) a.fStop += 1
    }
    val want = acc.toSeq.map { case (s, a) =>
      (s, a.n, a.kept, a.fWc, a.fMwl, a.fSym, a.fBul, a.fEll, a.fAlpha, a.fStop)
    }.sortBy(_._1)
    val got = TextAnalysis.gopherRules(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9)))
      .toSeq
    assert(got === want)
    // the battery must actually discriminate on this corpus
    assert(want.map(_._3).sum > 0 && want.map(_._3).sum < docs.length)
  }

  test("ridge1: coefficients match a local exact-sum normal-equation solve") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity"), round(col("l_discount") * 100, 0).cast("long"),
        col("l_extendedprice"))
      .collect().map(r => (BigDecimal(r.getDouble(0)).setScale(2),
        r.getLong(1), BigDecimal(r.getDouble(2)).setScale(2)))
    val n = rows.length.toDouble
    def d(b: BigDecimal) = b.toDouble
    val sx1 = d(rows.map(_._1).sum); val sx2 = rows.map(_._2).sum.toDouble
    val sx1x1 = d(rows.map(t => t._1 * t._1).sum)
    val sx1x2 = d(rows.map(t => t._1 * BigDecimal(t._2)).sum)
    val sx2x2 = rows.map(t => t._2 * t._2).sum.toDouble
    val sy = d(rows.map(_._3).sum)
    val sx1y = d(rows.map(t => t._1 * t._3).sum)
    val sx2y = d(rows.map(t => BigDecimal(t._2) * t._3).sum)
    val syy = d(rows.map(t => t._3 * t._3).sum)
    val (a11, a22) = (sx1x1 + 10.0, sx2x2 + 10.0)
    val c00 = a11 * a22 - sx1x2 * sx1x2
    val c01 = -(sx1 * a22 - sx1x2 * sx2)
    val c02 = sx1 * sx1x2 - a11 * sx2
    val c11 = n * a22 - sx2 * sx2
    val c12 = -(n * sx1x2 - sx1 * sx2)
    val c22 = n * a11 - sx1 * sx1
    val det = n * c00 + sx1 * c01 + sx2 * c02
    val b0 = (c00 * sy + c01 * sx1y + c02 * sx2y) / det
    val b1 = (c01 * sy + c11 * sx1y + c12 * sx2y) / det
    val b2 = (c02 * sy + c12 * sx1y + c22 * sx2y) / det
    val r = graft.operators.Stats.ridgeFit(spark, sf).head()
    assert(r.getLong(0) === rows.length.toLong)
    assert(math.abs(r.getDouble(1) - b0) < 1e-6)
    assert(math.abs(r.getDouble(2) - b1) < 1e-6)
    assert(math.abs(r.getDouble(3) - b2) < 1e-6)
    // residual check: the fitted plane beats the mean-only model
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
  }

  test("kt1: contingency-grid tau-b matches a brute-force O(n^2) pair scan") {
    val xy = Tables.orders(spark, sf)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long"),
        substring(col("o_orderpriority"), 1, 1).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var c = 0L; var d = 0L
    for (i <- xy.indices; j <- (i + 1) until xy.length) {
      val ((xa, ya), (xb, yb)) = (xy(i), xy(j))
      if ((xa < xb && ya < yb) || (xa > xb && ya > yb)) c += 1
      else if ((xa < xb && ya > yb) || (xa > xb && ya < yb)) d += 1
    }
    val n = xy.length.toDouble
    val n1 = xy.groupBy(_._1).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    val n2 = xy.groupBy(_._2).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    val half = n * (n - 1) / 2.0
    val tau = (c - d).toDouble / math.sqrt((half - n1) * (half - n2))
    val r = graft.operators.Stats.kendallTau(spark, sf).head()
    assert(r.getLong(0) === xy.length.toLong)
    assert(r.getLong(1) === c, "concordant")
    assert(r.getLong(2) === d, "discordant")
    assert(math.abs(r.getDouble(3) - tau) < 1e-9)
  }

  test("mod1: per-nation contributions match a literal replay; Q bounded") {
    val pairs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .join(Tables.customer(spark, sf), col("c_custkey") === col("o_custkey"))
      .join(Tables.supplier(spark, sf), col("s_suppkey") === col("l_suppkey"))
      .select(col("c_nationkey").cast("long"), col("s_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val m = pairs.length.toDouble
    val nations = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.sorted
    val want = nations.map { nat =>
      val within = pairs.count(p => p._1 == nat && p._2 == nat).toLong
      val dsum = pairs.count(_._1 == nat).toLong + pairs.count(_._2 == nat).toLong
      val ratio = dsum / (2.0 * m)
      (nat, dsum, within, within / m - ratio * ratio)
    }
    val got = graft.operators.Graph.modularityGate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((gn, gd, gw, gc), (wn, wd, ww, wc)) =>
      assert(gn === wn && gd === wd && gw === ww)
      assert(math.abs(gc - wc) < 1e-11)
    }
    val q = got.map(_._4).sum
    assert(q > -1.0 && q < 1.0)
  }

  test("us1: sampling both sides by the join-key hash preserves the join exactly") {
    val sampled = graft.operators.Relational.universeSample(spark, sf)
      .agg(sum(col("n_lines"))).head.getLong(0)
    // join first, then filter on the orders-side key alone
    val joinThenFilter = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 4) < "4000")
      .count()
    assert(sampled === joinThenFilter)
    // and per-side Bernoulli with DIFFERENT keys would not: sanity
    // that the sample is a strict, non-empty subset
    val full = Tables.lineitem(spark, sf).count()
    assert(sampled > 0 && sampled < full)
  }

  test("sprt1: distributed LLR walk matches a literal sequential replay") {
    val ev = Tables.events(spark, sf)
      .select((col("user_id") % 4).as("v"), unix_micros(col("ts")),
        col("event_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val l1 = BigDecimal("0.510826"); val l2 = BigDecimal("-0.125163")
    val up = BigDecimal("2.944439")
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (v, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      var s = BigDecimal(0); var llr = BigDecimal(0)
      var crossedAt = 0L; var decision = "continue"
      for ((succ, idx) <- ordered.zipWithIndex) {
        llr += (if (succ == 1) l1 else l2)
        if (crossedAt == 0L && (llr >= up || llr <= -up)) {
          crossedAt = idx + 1L
          decision = if (llr >= up) "accept_h1" else "accept_h0"
        }
      }
      (v, ordered.length.toLong, ordered.count(_ == 1L).toLong,
        decision, crossedAt,
        (BigDecimal(ordered.count(_ == 1L)) * l1
          + BigDecimal(ordered.count(_ == 0L)) * l2).toDouble)
    }
    val got = graft.operators.Stats.sprtGate(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 === w._1 && g._2 === w._2 && g._3 === w._3)
      assert(g._4 === w._4, s"decision for variant ${g._1}")
      assert(g._5 === w._5, s"crossing rank for variant ${g._1}")
      assert(math.abs(g._6 - w._6) < 1e-6)
    }
  }

  test("lof1: distributed LOF chain matches a literal local replay") {
    val data = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"),
        graft.operators.VectorOps.toDoubleArray(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val ids = data.map(_._1).sorted
    val vecs = data.toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrm = ids.map(i => i -> math.sqrt(dot(vecs(i), vecs(i)))).toMap
    def d6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val dist = (for (a <- ids; b <- ids if a != b)
      yield (a, b) -> d6(1.0 - dot(vecs(a), vecs(b)) / (nrm(a) * nrm(b)))).toMap
    val k = 5
    val kdist = ids.map { a =>
      val ds = ids.filter(_ != a).map(b => (dist((a, b)), b)).sorted
      a -> ds(k - 1)._1
    }.toMap
    val nk = ids.map(a =>
      a -> ids.filter(b => b != a && dist((a, b)) <= kdist(a))).toMap
    val lrd = ids.map { a =>
      val s = nk(a).map(o => kdist(o).max(dist((a, o)))).sum
      a -> BigDecimal(nk(a).size.toDouble / s.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.toMap
    val want = ids.map { a =>
      val s = nk(a).map(lrd).sum
      (a, nk(a).size.toLong,
        BigDecimal(s.toDouble / nk(a).size / lrd(a).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(t => (-t._3, t._1)).take(20)
    val got = graft.operators.Similarity.lofGate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === want.toSeq)
    // LOF ≈ 1 for inliers; the readout must surface genuine spread
    assert(got.head._3 > 1.0)
  }

  test("jcs1: exact pair count equals a real join; estimate is sane") {
    val r = graft.operators.Relational.joinCardStats(spark, sf).head()
    val realJoin = Tables.orders(spark, sf)
      .join(Tables.events(spark, sf), col("o_custkey") === col("user_id"))
      .count()
    assert(r.getLong(0) === realJoin, "exact_pairs must equal the actual join size")
    // containment estimate from 64 buckets: same order of magnitude
    assert(r.getLong(1) > realJoin / 10 && r.getLong(1) < realJoin * 10)
    assert(math.abs(r.getLong(2)) < 10000L * 9)
  }

  test("boot1: replica means match a literal per-replica replay; CI brackets the mean") {
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def hex4(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x${d(1) & 0xff}%02x"
    }
    val means = (0 until 32).map { r =>
      val kept = rows.filter { case (k, _) => hex4(s"$r:$k") < "8000" }
      BigDecimal(kept.map(_._2).sum.toDouble / kept.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sorted
    val out = graft.operators.Stats.subsampleCi(spark, sf).head()
    assert(out.getLong(0) === rows.length.toLong)
    assert(out.getDouble(2) === means(3), "10th-percentile order statistic")
    assert(out.getDouble(3) === means(28), "90th-percentile order statistic")
    assert(out.getDouble(2) < out.getDouble(1)
      && out.getDouble(1) < out.getDouble(3), "CI brackets the full mean")
  }

  test("rbo1: prefix-overlap closed form matches a literal per-depth replay") {
    val g = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("spend"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val k = 20
    val bySpend = g.sortBy(t => (-t._2, t._1)).take(k).map(_._1)
    val byCount = g.sortBy(t => (-t._3, t._1)).take(k).map(_._1)
    // literal definition: overlap of the two depth-d prefixes
    val terms = (1 to k).map { d =>
      val ov = bySpend.take(d).toSet.intersect(byCount.take(d).toSet).size
      val w = BigDecimal("0.9").pow(d - 1)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      BigDecimal(w.toDouble * ov / d)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val wantRbo = BigDecimal(0.1 * terms.sum.toDouble)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wantOv = bySpend.toSet.intersect(byCount.toSet).size.toLong
    val r = graft.operators.Quality.rboGate(spark, sf).head()
    assert(r.getLong(2) === wantOv)
    assert(r.getDouble(3) === wantRbo)
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0)
  }

  test("k15: the sink's required distribution is what clusters the files") {
    // Contract present: one file per priority (the gate hashes this at
    // the driver). Contract absent: the same 16-partition input
    // scatters every priority across many files — proving the
    // clustering came from RequiresDistributionAndOrdering, not luck.
    val root = tmpDir("graft_k15_spec_")
    Tables.orders(spark, sf)
      .selectExpr("o_orderpriority AS prio", "o_orderkey AS k")
      .repartition(16)
      .write.format("graft.sources.v2.LocalFileSink")
      .option("path", root + "/plain").mode("append").save()
    val scattered = spark.read.schema("prio STRING, k LONG")
      .csv(root + "/plain")
      .select(col("prio"), col("_metadata.file_path").as("f"))
      .groupBy(col("prio")).agg(countDistinct(col("f")).as("nf"))
      .collect().map(_.getLong(1))
    assert(scattered.max > 1L,
      "without the contract, priorities must span multiple files")
    val clustered = graft.operators.Ingest.v2RequiredDistribution(spark, sf)
      .collect()
    assert(clustered.forall(r => r.getLong(2) === 1L && r.getLong(3) === 0L))
    TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("yw1: Yule-Walker coefficients match a literal sequential estimate") {
    val xs = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("hr")).collect().map(_.getLong(1).toDouble)
    val n = xs.length
    val mu = xs.sum / n
    def gamma(k: Int): Double =
      (k until n).map(t => (xs(t) - mu) * (xs(t - k) - mu)).sum / n
    val (r1, r2) = (gamma(1) / gamma(0), gamma(2) / gamma(0))
    val phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    val phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val got = graft.operators.Stats.yuleWalkerGate(spark, sf).head()
    assert(got.getLong(0) === n.toLong)
    assert(math.abs(got.getDouble(1) - r1) < 1e-8)
    assert(math.abs(got.getDouble(2) - r2) < 1e-8)
    assert(math.abs(got.getDouble(3) - phi1) < 1e-8)
    assert(math.abs(got.getDouble(4) - phi2) < 1e-8)
  }

  test("att3: credit conserves conversions and matches a literal journey replay") {
    val out = graft.operators.Behavior.positionAttribution(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(math.abs(out.map(_._3).sum - purchases) < 1e-3,
      "total credit must equal the number of conversions")
    // literal replay per user journey
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    for ((_, rows) <- ev.groupBy(_._1)) {
      val ordered = rows.sortBy(r => (r._2, r._3))
      var journey = collection.mutable.ListBuffer[String]()
      for ((_, _, _, ty) <- ordered) {
        if (ty == "purchase") {
          val k = journey.length
          if (k == 0) want("none") += 1.0
          else journey.zipWithIndex.foreach { case (t, i) =>
            val c = if (k == 1) 1.0 else if (k == 2) 0.5
              else if (i == 0 || i == k - 1) 0.4 else 0.2 / (k - 2)
            want(t) += BigDecimal(c)
              .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
          journey.clear()
        } else journey += ty
      }
    }
    out.foreach { case (t, _, c) =>
      assert(math.abs(c - want(t)) < 1e-5, s"credit for channel $t")
    }
  }

  test("c9: largest-remainder apportionment hits the budget exactly") {
    val rows = graft.operators.TextAnalysis.curationV5(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val budget = 200L
    assert(rows.map(_._3).sum === budget, "allocations must sum to the budget")
    assert(rows.forall(r => r._4 === r._3), "picked == allocated per source")
    assert(rows.forall(r => r._3 <= r._2), "never allocate beyond availability")
    // Hamilton replay from the availabilities
    val n = rows.map(_._2).sum
    val base = rows.map(r => (r._1, r._2 * budget / n, r._2 * budget % n))
    val extras = (budget - base.map(_._2).sum).toInt
    val winners = base.sortBy(t => (-t._3, t._1)).take(extras).map(_._1).toSet
    base.foreach { case (s, b, _) =>
      val want = b + (if (winners(s)) 1 else 0)
      assert(rows.find(_._1 == s).get._3 === want, s"allocation for $s")
    }
  }

  test("hc1: bitmask multi-source BFS matches per-seed literal BFS") {
    val pairs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = collection.mutable.Map[Long, collection.mutable.Set[Long]]()
    for ((a, b) <- pairs) {
      adj.getOrElseUpdate(a, collection.mutable.Set()) += b
      adj.getOrElseUpdate(b, collection.mutable.Set()) += a
    }
    val seeds = adj.keys.filter(_ % 2 == 0).toSeq.sorted.take(8)
    val maxHops = 4
    val want = seeds.map { s =>
      val dist = collection.mutable.Map(s -> 0)
      var frontier = Set(s); var h = 0
      while (frontier.nonEmpty && h < maxHops) {
        h += 1
        frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
        frontier.foreach(dist(_) = h)
      }
      val others = dist.filter(_._2 > 0)
      val harm = others.values
        .map(d => BigDecimal(1.0 / d).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum
      (s / 2, others.size.toLong,
        BigDecimal(harm.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = graft.operators.Graph.harmonicCentrality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
  }

  test("ney1: allocations sum to the budget and follow N*S ordering") {
    val rows = graft.operators.Stats.neymanAllocation(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._4).sum === 1000L)
    // allocation order must match the N_h * S_h weight order
    val byWeight = rows.sortBy(r => -r._2 * r._3).map(_._1).toSeq
    val byAlloc = rows.sortBy(r => -r._4).map(_._1).toSeq
    assert(byWeight === byAlloc)
    // literal per-stratum stddev replay
    val cents = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { case (p, n, sdev, _) =>
      val xs = cents.filter(_._1 == p).map(_._2.toDouble)
      assert(xs.length.toLong === n)
      val mu = xs.sum / xs.length
      val s = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1))
      assert(math.abs(sdev - s) < 1.0, s"stddev for $p") // exact-sum form differs by fp only
    }
  }

  test("cor2: partial correlation matches a literal three-variable replay") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity"), round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"))
      .collect().map(r => (r.getDouble(0), r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = rows.length.toDouble
    def pearson(a: Array[Double], b: Array[Double]): Double = {
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map { case (x, y) => x * y }.sum
      val saa = a.map(x => x * x).sum; val sbb = b.map(x => x * x).sum
      (n * sab - sa * sb) / (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
    }
    val (x, y, z) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    val (rxy, rxz, ryz) = (pearson(x, y), pearson(x, z), pearson(y, z))
    val want = (rxy - rxz * ryz) /
      (math.sqrt(1.0 - rxz * rxz) * math.sqrt(1.0 - ryz * ryz))
    val got = graft.operators.Stats.partialCorrelation(spark, sf).head()
    assert(got.getLong(0) === rows.length.toLong)
    assert(math.abs(got.getDouble(1) - rxy) < 1e-8)
    assert(math.abs(got.getDouble(4) - want) < 1e-8)
  }

  test("gini2: the argmin threshold matches a brute-force impurity scan") {
    val rows = Tables.lineitem(spark, sf)
      .select(round(col("l_extendedprice") * 100).cast("long"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byV = rows.groupBy(_._1).map { case (v, g) =>
      (v, g.length.toLong, g.map(_._2).sum) }.toSeq.sortBy(_._1)
    val (tn, tp) = (byV.map(_._2).sum.toDouble, byV.map(_._3).sum.toDouble)
    var (cn, cp) = (0.0, 0.0)
    var best = (Double.MaxValue, Long.MaxValue)
    for ((v, nn, pp) <- byV) {
      cn += nn; cp += pp
      if (cn < tn) {
        val pl = cp / cn; val pr = (tp - cp) / (tn - cn)
        val wg = BigDecimal((cn / tn) * (2.0 * pl * (1.0 - pl))
          + ((tn - cn) / tn) * (2.0 * pr * (1.0 - pr)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (wg < best._1 || (wg == best._1 && v < best._2)) best = (wg, v)
      }
    }
    val got = graft.operators.Stats.bestGiniSplit(spark, sf).head()
    assert(got.getLong(0) === best._2)
    assert(math.abs(got.getDouble(1) - best._1) < 1e-11)
  }

  test("maha1: distances match a literal whitened-metric replay") {
    val prof = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("long"),
        sum(round(col("o_totalprice") * 100).cast("long")))
      .collect().map(r => (r.getLong(0), r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = prof.length.toDouble
    val (mx, my) = (prof.map(_._2).sum / n, prof.map(_._3).sum / n)
    val vxx = prof.map(p => (p._2 - mx) * (p._2 - mx)).sum / (n - 1)
    val vyy = prof.map(p => (p._3 - my) * (p._3 - my)).sum / (n - 1)
    val vxy = prof.map(p => (p._2 - mx) * (p._3 - my)).sum / (n - 1)
    val det = vxx * vyy - vxy * vxy
    val want = prof.map { case (k, x, y) =>
      val (dx, dy) = (x - mx, y - my)
      (k, (dx * dx * vyy - 2.0 * dx * dy * vxy + dy * dy * vxx) / det)
    }.sortBy(t => (-t._2, t._1)).take(10)
    val got = graft.operators.Stats.mahalanobisOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === want.map(_._1).toSeq)
    got.zip(want).foreach { case ((_, gd), (_, wd)) =>
      assert(math.abs(gd - wd) < 1e-5) }
    // whitened metric: the top outlier must dominate marginal z-scores
    assert(got.head._2 > 3.0)
  }

  test("an1: catalog stats match direct per-column queries") {
    val l = Tables.lineitem(spark, sf)
    val got = graft.operators.Quality.analyzeStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    val n = l.count()
    assert(got("l_orderkey")._1 === n)
    assert(got("l_orderkey")._3 === l.select("l_orderkey").distinct().count())
    assert(got("l_returnflag")._3 === l.select("l_returnflag").distinct().count())
    assert(got("l_returnflag")._4 === "A" && got("l_returnflag")._5 === "R")
    assert(got("l_quantity")._4 === "1" && got("l_quantity")._5 === "50")
    assert(got.values.forall(_._2 === 0L), "no nulls in this corpus")
  }

  test("cs2: Cramer's V matches a literal contingency replay and is in [0,1]") {
    val cells = Tables.events(spark, sf)
      .groupBy(col("event_type"), (col("user_id") % 5))
      .agg(count(lit(1)))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val n = cells.map(_._2).sum.toDouble
    val rt = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val chi2 = cells.map { case ((r, c), obs) =>
      val exp = rt(r).toDouble * ct(c) / n
      BigDecimal((obs - exp) * (obs - exp) / exp)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val k = math.min(rt.size - 1, ct.size - 1)
    val v = math.sqrt(chi2.toDouble / (n * k))
    val got = graft.operators.Relational.cramersV(spark, sf).head()
    assert(got.getLong(0) === n.toLong)
    assert(math.abs(got.getDouble(3) - chi2.toDouble) < 1e-5)
    assert(math.abs(got.getDouble(4) - v) < 1e-8)
    assert(got.getDouble(4) >= 0.0 && got.getDouble(4) <= 1.0)
  }

  test("lev1: Brown-Forsythe matches a literal median/ANOVA replay") {
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byG = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      // textbook median: average of the two middle order statistics
      // for even n (round-10 convention change, matching DuckDB median)
      val lo = sorted((sorted.length + 1) / 2 - 1)
      val hi = sorted(sorted.length / 2)
      g -> (sorted, (lo + hi) / 2.0)
    }
    val zs = byG.map { case (g, (vs, med)) => g -> vs.map(v => math.abs(v - med)) }
    val tn = zs.values.map(_.length).sum.toDouble
    val grand = zs.values.map(_.sum).sum / tn
    val k = zs.size.toDouble
    val ssb = zs.values.map { z =>
      val m = z.sum / z.length
      BigDecimal(z.length * ((m - grand) * (m - grand)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val ssw = zs.values.map { z =>
      val m = z.sum / z.length
      BigDecimal(z.map(x => (x - m) * (x - m)).sum)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val f = (ssb.toDouble / (k - 1)) / (ssw.toDouble / (tn - k))
    val got = graft.operators.Stats.brownForsythe(spark, sf).collect()
    got.foreach { r =>
      val (vs, med) = byG(r.getString(0))
      assert(r.getLong(1) === vs.length.toLong)
      assert(r.getDouble(2) === med, s"median for ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - f) < 1e-4, "F statistic")
    }
  }

  test("wil1: intervals bracket p_hat and shrink with n; literal formula replay") {
    val rows = graft.operators.Stats.wilsonIntervals(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val z = 1.959964
    rows.foreach { case (p0, n, nf, ph, lo, hi) =>
      assert(lo < ph && ph < hi, s"bracket for $p0")
      val p = nf.toDouble / n
      val half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
      val denom = 1.0 + z * z / n
      assert(math.abs(lo - (p + z * z / (2 * n) - half) / denom) < 1e-8)
      assert(math.abs(hi - (p + z * z / (2 * n) + half) / denom) < 1e-8)
    }
  }
}
