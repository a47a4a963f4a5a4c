package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Relational}

class AnalyticsSpec extends SparkSpec {

  test("pricing summary groups are complete and internally consistent") {
    val rows = Analytics.pricingSummary(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val min = r.getAs[Double]("min_qty"); val max = r.getAs[Double]("max_qty")
      val avg = r.getAs[Double]("avg_qty"); val n = r.getAs[Long]("count_order")
      assert(min <= avg && avg <= max, s"min<=avg<=max violated: $r")
      assert(n > 0)
      assert(math.abs(r.getAs[Double]("sum_qty") / n - avg) < 1e-9)
    }
  }

  test("top-k recent equals sorted prefix") {
    val top = Analytics.topKRecent(spark, sf, 5).collect().map(_.getLong(0))
    val all = Tables.events(spark, sf)
      .orderBy(desc("ts"), asc("event_id")).limit(5)
      .select("event_id").collect().map(_.getLong(0))
    assert(top.toSeq == all.toSeq)
  }

  test("grouped min <= grouped max per key") {
    val mins = Analytics.groupedMin(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val maxs = Analytics.groupedMax(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mins.keySet == maxs.keySet && mins.nonEmpty)
    mins.foreach { case (k, v) => assert(v <= maxs(k)) }
  }

  test("aggregate of empty relation yields null (SQLite max-of-empty parity)") {
    val empty = Tables.events(spark, sf).filter(lit(false))
    val r = empty.agg(max(col("value"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("count invariant under repartition") {
    val df = Tables.lineitem(spark, sf)
    assert(df.count() == df.repartition(13).count())
  }

  test("filter predicate is pushed to the parquet scan") {
    val plan = Analytics.filterEq(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("event_type"),
      s"expected pushdown in:\n$plan")
  }

  test("exactSum is partition-order invariant") {
    val df = Tables.lineitem(spark, sf)
    val a = df.agg(Analytics.exactSum(col("l_extendedprice"))).collect()(0).getDouble(0)
    val b = df.repartition(17).agg(Analytics.exactSum(col("l_extendedprice")))
      .collect()(0).getDouble(0)
    assert(a == b, "decimal-accumulated sum must not depend on partitioning")
  }

  test("semi + anti join partition the customer set") {
    val withO = Relational.customersWithBigOrders(spark, sf).count()
    val without = Relational.customersWithoutBigOrders(spark, sf).count()
    val total = Tables.customer(spark, sf).count()
    assert(withO + without == total)
  }
}
