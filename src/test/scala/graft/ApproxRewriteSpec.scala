package graft

import org.apache.spark.sql.functions._
import graft.plans.ApproxCountDistinctRewrite

class ApproxRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](enabled: Boolean)(f: => T): T = {
    spark.experimental.extraOptimizations =
      Seq(ApproxCountDistinctRewrite)
    spark.conf.set(ApproxCountDistinctRewrite.ConfKey, enabled.toString)
    try f
    finally {
      spark.conf.unset(ApproxCountDistinctRewrite.ConfKey)
      spark.experimental.extraOptimizations = Nil
    }
  }

  private val df = (1 to 1000).map(i => ("k", i % 137)).toSeq

  test("disabled (default): COUNT DISTINCT stays exact") {
    withRule(enabled = false) {
      val q = df.toDF("k", "x").groupBy("k").agg(countDistinct("x"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("approx_count_distinct"), plan)
      assert(q.collect()(0).getLong(1) == 137L)
    }
  }

  test("enabled: COUNT DISTINCT rewrites to HyperLogLog++ sketch") {
    withRule(enabled = true) {
      val q = df.toDF("k", "x").groupBy("k").agg(countDistinct("x").as("n"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"), plan)
      val n = q.collect()(0).getLong(1)
      // HLL++ at default rsd: within 5% of 137
      assert(math.abs(n - 137L) <= 137 * 0.05, s"estimate too far: $n")
    }
  }

  test("rewrite applies to ad-hoc SQL, not just engine call sites") {
    withRule(enabled = true) {
      df.toDF("k", "x").createOrReplaceTempView("approx_t")
      val q = spark.sql("SELECT COUNT(DISTINCT x) FROM approx_t")
      assert(q.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
    }
  }

  test("multi-column COUNT DISTINCT is NOT rewritten (different quantity)") {
    withRule(enabled = true) {
      val q = df.toDF("k", "x").groupBy("k")
        .agg(countDistinct(col("k"), col("x")).as("n"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("approx_count_distinct"), plan)
      assert(q.collect()(0).getLong(1) == 137L)
    }
  }

  private def withPercentileRule[T](enabled: Boolean)(f: => T): T = {
    spark.experimental.extraOptimizations =
      Seq(graft.plans.ApproxPercentileRewrite)
    spark.conf.set(graft.plans.ApproxPercentileRewrite.ConfKey, enabled.toString)
    try f
    finally {
      spark.conf.unset(graft.plans.ApproxPercentileRewrite.ConfKey)
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("percentile rewrites to the GK sketch only under the flag, within error") {
    val vals = (1 to 10000).map(_.toDouble).toDF("v")
    withPercentileRule(enabled = false) {
      val q = vals.agg(expr("percentile(v, 0.9)"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("percentile_approx"))
      assert(math.abs(q.collect()(0).getDouble(0) - 9000.1) < 1e-6)
    }
    withPercentileRule(enabled = true) {
      val q = vals.agg(expr("percentile(v, 0.9)").as("p90"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("percentile_approx"), plan)
      val v = q.collect()(0).getDouble(0)
      assert(math.abs(v - 9000.0) <= 10000.0 / 10000 * 5,
        s"sketch estimate too far: $v")
    }
  }

  test("non-double percentile is NOT rewritten (approx would change the result type)") {
    withPercentileRule(enabled = true) {
      val q = (1 to 100).toDF("i").agg(expr("percentile(i, 0.5)").as("p"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("percentile_approx"), plan)
      assert(q.collect()(0).getDouble(0) == 50.5)
    }
  }

  test("deterministic HLL (x11): estimate within sketch error of the exact count") {
    val r = graft.operators.Relational.hllDistinctUsers(spark, sf).collect()(0)
    val m = r.getInt(0); val vEmpty = r.getLong(1); val isum = r.getLong(2)
    val est = r.getDouble(4); val exact = r.getLong(5)
    assert(m == 64 && isum > 0 && vEmpty >= 0 && vEmpty <= 64)
    // m=64 standard error is 1.04/sqrt(64) = 13%; linear counting covers
    // the small range. 40% is a loose determinism-safe bound.
    assert(math.abs(est - exact) <= math.max(0.4 * exact, 3.0),
      s"est $est vs exact $exact")
    // fully deterministic: a second run yields the identical row
    val twice = graft.operators.Relational.hllDistinctUsers(spark, sf).collect()(0)
    assert(twice.toSeq == r.toSeq)
  }
}
