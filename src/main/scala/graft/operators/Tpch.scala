package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The eleven TPC-H query shapes not yet in the gated surface — q2, q4,
  * q8, q9, q11, q12, q15, q16, q17, q20, q21 — completing all 22 TPC-H
  * plan shapes over the driver's trimmed schema.
  *
  * The driver's tables omit `partsupp` and the lineitem commit/receipt
  * dates, so the five partsupp-based queries run over a DETERMINISTIC
  * DERIVED partsupp (same closed-form on the engine and DuckDB-oracle
  * sides — see [[partsupp]]), and "late" is re-expressed as
  * `l_shipdate > o_orderdate + N days`. The PLAN SHAPES are the
  * faithful part: correlated min (q2), EXISTS semi join (q4), two-level
  * share-of-total (q8), multi-way profit join (q9), group-HAVING vs a
  * global scalar (q11), conditional counts over a join (q12), max-equality
  * tie-keeping (q15), distinct-count with NOT IN (q16), correlated avg
  * threshold (q17), nested semi over a correlated sum (q20), and the
  * EXISTS/NOT-EXISTS double self-correlation (q21).
  *
  * Scale notes: partsupp derives to 4·|part| rows (dimension-scale even
  * at 100 TB fact volumes); every dim join is an explicit broadcast;
  * fact-side aggregations are map-side combinable before their shuffle;
  * correlated subqueries are expressed as the aggregate-then-rejoin plans
  * Catalyst would decorrelate to anyway.
  */
object Tpch {

  /** Deterministic derived partsupp: each part is offered by 4 suppliers
    * chosen by a closed-form hash of (p_partkey, j), with availqty and
    * integer-cent supply cost likewise closed-form. The DuckDB oracle
    * computes the identical expressions, so both engines see the same
    * relation without a stored table. Cost stays integer cents end-to-end
    * (BIGINT leaves no room for decimal-rounding divergence).
    */
  def partsupp(spark: SparkSession, dir: String): DataFrame = {
    val sCnt = Tables.supplier(spark, dir).agg(count(lit(1)).as("s_cnt"))
    val js = spark.range(4).select(col("id").as("j"))
    val suppkey = (col("p_partkey") * 7 + col("j") * 13) % col("s_cnt")
    Tables.part(spark, dir).select(col("p_partkey"))
      .crossJoin(broadcast(js))
      .crossJoin(broadcast(sCnt))
      .select(
        col("p_partkey"),
        suppkey.as("ps_suppkey"),
        (lit(1) + (col("p_partkey") * 3 + suppkey * 5) % 1000)
          .as("ps_availqty"),
        (lit(1) + (col("p_partkey") * 31 + suppkey * 17) % 10000)
          .as("ps_cost_cents"))
      .distinct() // small moduli can collide at tiny SFs; rows are full dups
  }

  /** SQL text of the identical derivation, prepended to each
    * partsupp-consuming oracle (DuckDB).
    */
  val partsuppSql: String =
    """ps AS (
      |  SELECT DISTINCT p_partkey,
      |    (p_partkey * 7 + j * 13) % s_cnt AS ps_suppkey,
      |    1 + (p_partkey * 3 + ((p_partkey * 7 + j * 13) % s_cnt) * 5) % 1000 AS ps_availqty,
      |    1 + (p_partkey * 31 + ((p_partkey * 7 + j * 13) % s_cnt) * 17) % 10000 AS ps_cost_cents
      |  FROM part, (VALUES (CAST(0 AS BIGINT)),(1),(2),(3)) AS js(j),
      |       (SELECT count(*) AS s_cnt FROM supplier)
      |)""".stripMargin

  /** q2: minimum-cost supplier per part (TPC-H Q2's correlated-min
    * shape). The correlated `MIN(ps_supplycost)` subquery is expressed
    * as the aggregate-then-rejoin plan: min cents per part over the
    * region-eligible offers, equi-joined back on (part, cents) — ties
    * keep every min-cost supplier, exactly like the NOT EXISTS form.
    * Dims (supplier/nation/region) broadcast; the partsupp side is
    * 4·|part| and aggregates map-side before its exchange.
    */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val p = Tables.part(spark, dir)
      .filter(col("p_type") === "SMALL" && col("p_size") <= 15)
      .select(col("p_partkey"), col("p_name"))
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "EUROPE")
    val eligible = ps
      .join(p, "p_partkey")
      .join(broadcast(s), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("s_acctbal"), col("n_name"), col("ps_cost_cents"))
    val minCost = eligible.groupBy(col("p_partkey"))
      .agg(min(col("ps_cost_cents")).as("min_cents"))
    eligible
      .join(minCost, Seq("p_partkey"))
      .filter(col("ps_cost_cents") === col("min_cents"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("ps_cost_cents").cast("bigint").as("cost_cents"))
      .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"),
        col("p_partkey"), col("s_suppkey"))
      .limit(100)
  }

  /** q4: order-priority check (TPC-H Q4's EXISTS shape). Orders in one
    * quarter having at least one "late" line (shipped > 75 days after
    * the order date) — EXISTS compiles to a left-semi join, so the probe
    * side never materializes matches; counts per priority are a 5-group
    * map-side-combinable aggregation.
    */
  def priorityExists(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 75 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** q8: national market share (TPC-H Q8). Share of NATION_7 suppliers
    * in ASIA-customer ECONOMY-part volume, by order year. nation joins
    * twice under different roles (customer side filters via region,
    * supplier side labels the volume) — both broadcast. The CASE-share
    * division happens once per year group after exact DECIMAL sums.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    val cn = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val s = Tables.supplier(spark, dir)
    val sn = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_nationkey"), col("n_name").as("supp_nation"))
    val p = Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")
    val volume = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(30,6)")
    val v = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_nationkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(year(col("o_orderdate")).cast("int").as("o_year"),
        volume.as("volume"), col("supp_nation"))
    v.groupBy(col("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_7", col("volume"))
          .otherwise(lit(0).cast("decimal(30,6)"))).cast("double")
          / sum(col("volume")).cast("double"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** q9: product-type profit (TPC-H Q9's 5-way join). Profit =
    * revenue − supply cost × qty for 'widget' parts, by supplier nation
    * and order year. Supply cost is the same closed-form integer-cent
    * function of (partkey, suppkey) the derived partsupp uses, applied
    * inline — the join tree (lineitem ⋈ orders ⋈ part ⋈ supplier ⋈
    * nation) is the faithful Q9 plan with every dim broadcast.
    */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_name").like("%widget%"))
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val costCents = lit(1) +
      (col("l_partkey") * 31 + col("l_suppkey") * 17) % 10000
    val amount = (col("l_extendedprice") * (lit(1) - col("l_discount")) -
      costCents / lit(100.0) * col("l_quantity")).cast("decimal(30,6)")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"),
        amount.as("amount"))
      .groupBy(col("nation"), col("o_year"))
      .agg(round(sum(col("amount")).cast("double"), 4).as("sum_profit"))
      .orderBy(col("nation"), col("o_year"))
  }

  /** q11: important stock (TPC-H Q11's HAVING-vs-global-scalar shape).
    * Per-part inventory value (cents × qty, BIGINT end-to-end) over
    * ASIA-nation suppliers, kept when above 0.1% of the total. The
    * global total is a 1-row frame cross-joined in (broadcast), and the
    * ×1000 threshold comparison stays in exact integer arithmetic
    * (values ≤ ~8e12 even at sf100 — far inside BIGINT).
    */
  def importantStock(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir).filter(col("n_regionkey") === 2)
    val value = ps
      .join(broadcast(s), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("p_partkey"))
      .agg(sum(col("ps_cost_cents") * col("ps_availqty")).as("v"))
    val tot = value.agg(sum(col("v")).as("t"))
    value.crossJoin(broadcast(tot))
      .filter(col("v") * 1000 > col("t"))
      .select(col("p_partkey"), col("v").cast("bigint").as("value_cents"))
      .orderBy(desc("value_cents"), col("p_partkey"))
  }

  /** q12: priority counts over late lines (TPC-H Q12's conditional-count
    * shape; l_returnflag stands in for the absent l_shipmode). One
    * fact-fact join, then two CASE-counts per group — both map-side
    * combinable into a 3-row result.
    */
  def priorityLines(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag").as("rflag"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).cast("bigint").as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).cast("bigint").as("low_line_count"))
      .orderBy(col("rflag"))
  }

  /** q15: top supplier (TPC-H Q15's max-equality view shape). Revenue
    * per supplier over one quarter; the max is a 1-row broadcast and the
    * equality compares the EXACT DECIMAL sums (never rounded doubles),
    * so ties are kept deterministically on both engines.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(30,6)")).as("total_revenue"))
    val m = rev.agg(max(col("total_revenue")).as("mr"))
    Tables.supplier(spark, dir)
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(m))
      .filter(col("total_revenue") === col("mr"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("total_revenue").cast("double"), 4).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** q16: supplier variety (TPC-H Q16's distinct-count + NOT IN shape).
    * Distinct eligible suppliers per (brand, type, size), excluding
    * negative-balance suppliers — NOT IN over a non-null key set is a
    * left-anti join; the distinct count shuffles only (brand,type,size,
    * suppkey) tuples from the dimension-scale derived partsupp.
    */
  def supplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    val excl = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    ps.join(p, "p_partkey")
      .join(broadcast(excl), col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** q17: small-quantity revenue (TPC-H Q17's correlated-avg shape).
    * Lines of Brand#23 small parts with quantity under 20% of that
    * part's average quantity — the correlated AVG decorrelates to a
    * per-part aggregate rejoined on partkey (map-side combinable), and
    * the final single-row sum uses the exact DECIMAL discipline.
    */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#23" && col("p_size") < 10)
      .select(col("p_partkey"))
    val avgQty = l.groupBy(col("l_partkey").as("aq_partkey"))
      .agg((sum(col("l_quantity").cast("decimal(30,6)")).cast("double")
        / count(lit(1))).as("aq"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("aq_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("aq"))
      .agg(round(coalesce(
        sum(col("l_extendedprice").cast("decimal(30,2)")).cast("double"),
        lit(0.0)) / 7.0, 4).as("avg_yearly"))
  }

  /** q20: excess-stock suppliers (TPC-H Q20's nested-semi shape).
    * EUROPE-nation suppliers holding more than half a year's shipped
    * quantity of some 'small…' part — the correlated SUM decorrelates
    * to a (part, supplier)-grained aggregate left-joined under the
    * availqty comparison, and the outer EXISTS is a semi join on the
    * distinct qualifying supplier keys.
    */
  def excessStockSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val p = Tables.part(spark, dir)
      .filter(col("p_name").like("small%")).select(col("p_partkey"))
    val shipped = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(30,2)")).cast("double")
        .as("qty"))
    val qualifying = ps
      .join(p, "p_partkey")
      .join(shipped,
        col("p_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"), "left")
      .filter(col("ps_availqty") > lit(0.5) * coalesce(col("qty"), lit(0.0)))
      .select(col("ps_suppkey")).distinct()
    val n = Tables.nation(spark, dir).filter(col("n_regionkey") === 3)
    Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(qualifying, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_name"), col("s_suppkey"))
      .orderBy(col("s_suppkey"))
  }

  /** q21: suppliers who kept orders waiting (TPC-H Q21's famous
    * EXISTS / NOT-EXISTS double self-correlation). For AMERICA-region
    * suppliers: late lines (shipped > 60 days after order date) of
    * finalized orders where ANOTHER supplier participated (EXISTS →
    * semi join with a compound key+inequality condition) but NO other
    * supplier was also late (NOT EXISTS → anti join, same condition
    * over the late set). Counted per supplier.
    */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val late = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val n = Tables.nation(spark, dir).filter(col("n_regionkey") === 1)
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"), "left_semi")
    val others = l.select(col("l_orderkey").as("o2_orderkey"),
      col("l_suppkey").as("o2_suppkey")).distinct()
    val lateOthers = late.select(col("l_orderkey").as("o3_orderkey"),
      col("l_suppkey").as("o3_suppkey")).distinct()
    late
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(others,
        col("l_orderkey") === col("o2_orderkey") &&
          col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
      .join(lateOthers,
        col("l_orderkey") === col("o3_orderkey") &&
          col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_suppkey"))
      .limit(100)
  }
}
