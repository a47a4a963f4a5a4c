package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: run named gates once (warm) and print how many
  * Spark JOBS / STAGES / TASKS each submitted — the driver-side
  * scheduling exposure that turns into wall-clock fragility on a
  * contended box (PERF.md §Round 11: the graph family's noisy-box
  * inflation is stage-count sensitivity, not plan cost). Use to
  * verify a fusion actually removed scheduler round-trips, because
  * wall-clock on a throttled box cannot.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.cteRecursionRowLimit", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    })
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      graft.operators.Ranks.releaseAll()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      graft.operators.Ranks.releaseAll()
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // Listener events are async; give the bus a beat to drain.
      Thread.sleep(300)
      println(f"JOBCOUNT $name jobs=$jobs stages=$stages tasks=$tasks wall=$dt%.2f")
    }
    spark.stop()
  }
}
