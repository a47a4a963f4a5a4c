package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ingest, Relational, TextAnalysis}

/** Round-6 additions: skyline (sky1), FD audit (fd1), token entropy
  * (ent1), and the erasure-cascade audit (k12) — each checked against
  * a local brute-force recompute, not just shape.
  */
class SkylineProfilingSpec extends SparkSpec {

  test("skyline: kept rows are exactly the non-dominated set (brute force)") {
    val metrics = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        (sum(col("o_totalprice").cast("decimal(30,2)")) * lit(100)).cast("long").as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force dominance: minimize n, maximize s
    val expected = metrics.filter { case (_, na, sa) =>
      !metrics.exists { case (_, nb, sb) =>
        nb <= na && sb >= sa && (nb < na || sb > sa)
      }
    }.map(_._1).toSet
    val got = Relational.customerSkyline(spark, sf)
      .collect().map(_.getAs[Long]("custkey")).toSet
    assert(got == expected)
  }

  test("skyline: frontier is strictly increasing in both axes") {
    val rows = Relational.customerSkyline(spark, sf).collect()
    assert(rows.length > 1)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_orders") < b.getAs[Long]("n_orders"))
      assert(a.getAs[Long]("spend_cents") < b.getAs[Long]("spend_cents"),
        "spend must rise with the order-count budget along the frontier")
    }
  }

  test("fd audit: held FDs verified by brute recount; violations nonnegative") {
    val rows = Relational.functionalDeps(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") >= r.getAs[Long]("n_lhs"))
      assert(r.getAs[Boolean]("holds") ==
        (r.getAs[Long]("n_violating_combos") == 0L))
    }
    val nation = rows.find(_.getString(0) == "nation").get
    assert(nation.getAs[Boolean]("holds"), "n_nationkey -> n_regionkey is a true FD")
    // brute recount of one failing candidate
    val part = Tables.part(spark, sf)
      .select(col("p_brand"), col("p_type")).distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    val fd = rows.find(_.getString(0) == "part").get
    assert(fd.getAs[Long]("n_pairs") == part.length)
    assert(fd.getAs[Long]("n_lhs") == part.map(_._1).distinct.length)
  }

  test("token entropy: bounds, degenerate docs, and a local recompute") {
    val rows = TextAnalysis.tokenEntropy(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val hn = r.getAs[Double]("norm_entropy")
      val types = r.getAs[Long]("n_types")
      assert(h >= -1e-9, s"negative entropy: $h")
      // h is rounded to 6 decimals, so allow the half-ulp of that grid
      assert(h <= math.log(types.toDouble) + 5e-7, "entropy exceeds ln(n_types)")
      assert(hn >= -1e-9 && hn <= 1.0 + 1e-9)
      if (types == 1) assert(math.abs(h) < 1e-9)
    }
    // local recompute for a handful of docs
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 5)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      val counts = toks.groupBy(identity).map(_._2.size)
      val n = toks.size.toDouble
      val h = math.log(n) - counts.map(c => c * math.log(c.toDouble)).sum / n
      assert(math.abs(byId(id).getAs[Double]("entropy") - h) < 1e-5,
        s"doc $id entropy mismatch")
      assert(byId(id).getAs[Long]("n_types") == counts.size)
    }
  }

  test("distribution ranks: bounds, decile balance, segment extremes") {
    val rows = graft.operators.Behavior.distributionRanks(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pr = r.getAs[Double]("seg_pct_rank")
      val cd = r.getAs[Double]("seg_cume_dist")
      assert(pr >= 0.0 && pr <= 1.0)
      assert(cd > 0.0 && cd <= 1.0)
      assert(pr <= cd + 1e-9, "percent_rank can never exceed cume_dist")
      val d = r.getAs[Int]("spend_decile")
      assert(d >= 1 && d <= 10)
    }
    // each segment has exactly one pct_rank == 0 (its minimum spender)
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    bySeg.values.foreach { seg =>
      assert(seg.count(_.getAs[Double]("seg_pct_rank") == 0.0) == 1)
    }
    // ntile balance: decile sizes differ by at most 1
    val sizes = rows.groupBy(_.getAs[Int]("spend_decile")).values.map(_.length)
    assert(sizes.max - sizes.min <= 1)
  }

  test("last-touch attribution: shares sum to 1, purchases conserved") {
    val rows = graft.operators.Behavior.lastTouchAttribution(spark, sf).collect()
    assert(rows.map(_.getAs[String]("touch")).distinct.length == rows.length)
    assert(rows.forall(_.getAs[String]("touch") != "purchase"),
      "a purchase can never attribute to itself")
    val totalPurchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == totalPurchases)
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
  }

  test("cascade delete audit: counts consistent along the FK chain") {
    val rows = Ingest.cascadeDeleteAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("rows_deleted") >= 0)
      assert(r.getAs[Long]("rows_kept") ==
        r.getAs[Long]("rows_total") - r.getAs[Long]("rows_deleted"))
    }
    // brute recount of the customer front
    val nDoomed = Tables.customer(spark, sf)
      .filter(col("c_nationkey") === 7).count()
    assert(rows("customer").getAs[Long]("rows_deleted") == nDoomed)
    // orders of surviving customers are never deleted
    val survivingOrders = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).filter(col("c_nationkey") =!= 7),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(rows("orders").getAs[Long]("rows_kept") == survivingOrders)
  }
}
