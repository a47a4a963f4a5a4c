package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** bl1: the runtime bloom filter must actually land in the plan under
  * the pinned configs, and must not change the join's results.
  */
class BloomJoinSpec extends SparkSpec {

  private def withConfs(pins: Seq[(String, String)])(body: => Unit): Unit = {
    val prev = pins.map { case (k, _) => k -> spark.conf.getOption(k) }
    pins.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter is injected under pinned confs and preserves results") {
    val plain = Relational.bloomJoinQuery(spark, sf).collect().map(_.toSeq)
    withConfs(Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")) {
      val q = Relational.bloomJoinQuery(spark, sf)
      val plan = q.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("bloom") || plan.contains("might_contain"),
        s"no bloom filter in optimized plan:\n$plan")
      assert(q.collect().map(_.toSeq).toSeq == plain.toSeq)
    }
    // gate wrapper returns the same rows with confs restored afterwards
    val gate = Relational.bloomPrunedJoin(spark, sf).collect().map(_.toSeq)
    assert(gate.toSeq == plain.toSeq)
  }
}
