package graft

import org.apache.spark.sql.functions._
import graft.operators.Tpch

/** Round-8 part 3: the 11 remaining TPC-H shapes (q2, q4, q8, q9, q11,
  * q12, q15, q16, q17, q20, q21) — semantic invariants beyond the
  * DuckDB hash gate.
  */
class TpchCompletionSpec extends SparkSpec {

  test("partsupp: deterministic, 4-ish offers per part, keys in range") {
    val ps = Tpch.partsupp(spark, sf).cache()
    val nPart = Tables.part(spark, sf).count()
    val nSupp = Tables.supplier(spark, sf).count()
    val n = ps.count()
    // DISTINCT can only collapse; never more than 4 offers per part.
    assert(n <= 4 * nPart && n >= nPart)
    val bad = ps.filter(col("ps_suppkey") < 0 || col("ps_suppkey") >= nSupp ||
      col("ps_availqty") < 1 || col("ps_availqty") > 1000 ||
      col("ps_cost_cents") < 1 || col("ps_cost_cents") > 10000).count()
    assert(bad == 0)
    // Pure function: a second derivation is identical.
    assert(Tpch.partsupp(spark, sf).exceptAll(ps).count() == 0)
    ps.unpersist()
  }

  test("q2: every returned offer is the minimum cost for its part") {
    val rows = Tpch.minCostSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    // Within the result, all offers for a part carry the same (min) cost.
    byPart.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("cost_cents")).distinct.length == 1)
    }
    // Descending acctbal ordering holds.
    val bals = rows.map(_.getAs[Double]("s_acctbal"))
    assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
  }

  test("q4: semi-join counts equal the distinct late-order count") {
    val total = Tpch.priorityExists(spark, sf)
      .agg(sum(col("order_count"))).head().getLong(0)
    val manual = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .join(Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 75 DAYS"))
      .select(col("o_orderkey")).distinct().count()
    assert(total == manual)
  }

  test("q8: market shares are proper fractions") {
    val rows = Tpch.marketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("q11: every kept part exceeds the threshold; dropped parts don't") {
    val kept = Tpch.importantStock(spark, sf).collect()
    assert(kept.nonEmpty)
    val total = kept.map(_.getAs[Long]("value_cents")).sum // kept subset only
    // Recompute the full per-part value and the global total directly.
    val ps = Tpch.partsupp(spark, sf)
    val s = Tables.supplier(spark, sf)
    val n = Tables.nation(spark, sf).filter(col("n_regionkey") === 2)
    val full = ps.join(s, col("ps_suppkey") === col("s_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("p_partkey"))
      .agg(sum(col("ps_cost_cents") * col("ps_availqty")).as("v"))
      .collect()
    val grand = full.map(_.getAs[Long]("v")).sum
    val keptSet = kept.map(_.getAs[Long]("p_partkey")).toSet
    full.foreach { r =>
      val in = keptSet.contains(r.getAs[Long]("p_partkey"))
      assert(in == (r.getAs[Long]("v") * 1000 > grand))
    }
    assert(total <= grand)
  }

  test("q12: high+low counts partition the late-line join") {
    val rows = Tpch.priorityLines(spark, sf).collect()
    val sumBoth = rows.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum
    val manual = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .count()
    assert(sumBoth == manual)
  }

  test("q15: reported suppliers all carry the maximum revenue") {
    val rows = Tpch.topSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }

  test("q16: no excluded (negative-balance) supplier is ever counted") {
    // Re-run the aggregation keyed by supplier to inspect membership.
    val ps = Tpch.partsupp(spark, sf)
    val excl = Tables.supplier(spark, sf).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val p = Tables.part(spark, sf)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    val contributing = ps.join(p, "p_partkey")
      .select(col("ps_suppkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    // The gate's anti join removes exactly the excluded keys.
    val counted = contributing -- excl
    assert(counted.intersect(excl).isEmpty)
    val maxCnt = Tpch.supplierVariety(spark, sf)
      .agg(max(col("supplier_cnt"))).head().getLong(0)
    assert(maxCnt <= counted.size)
  }

  test("q17: every contributing line is under 20% of its part's avg qty") {
    val v = Tpch.smallQtyRevenue(spark, sf).head().getAs[Double]("avg_yearly")
    assert(v >= 0.0)
    // Manual recomputation of the same filter must agree to the cent.
    val l = Tables.lineitem(spark, sf)
    val avgQty = l.groupBy(col("l_partkey").as("k"))
      .agg((sum(col("l_quantity").cast("decimal(30,6)")).cast("double")
        / count(lit(1))).as("aq"))
    val p = Tables.part(spark, sf)
      .filter(col("p_brand") === "Brand#23" && col("p_size") < 10)
      .select(col("p_partkey"))
    val manual = l.join(p, col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("k"))
      .filter(col("l_quantity") < lit(0.2) * col("aq"))
      .agg(coalesce(sum(col("l_extendedprice").cast("decimal(30,2)"))
        .cast("double"), lit(0.0)))
      .head().getDouble(0)
    assert(math.abs(v - manual / 7.0) < 1e-4)
  }

  test("q20: reported suppliers are in-region and hold excess stock") {
    val rows = Tpch.excessStockSuppliers(spark, sf).collect()
    val regionSupp = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf).filter(col("n_regionkey") === 3),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(regionSupp.contains(r.getAs[Long]("s_suppkey"))))
  }

  test("q21: counted late lines are sole-late in multi-supplier orders") {
    val rows = Tpch.waitingSuppliers(spark, sf).collect()
    // numwait is positive and ordering is (numwait DESC, s_suppkey).
    rows.foreach(r => assert(r.getAs[Long]("numwait") > 0))
    val ws = rows.map(r => (r.getAs[Long]("numwait"), r.getAs[Long]("s_suppkey")))
    assert(ws.zip(ws.tail).forall { case ((n1, k1), (n2, k2)) =>
      n1 > n2 || (n1 == n2 && k1 < k2)
    })
  }
}
