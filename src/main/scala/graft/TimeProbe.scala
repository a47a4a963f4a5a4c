package graft
import org.apache.spark.sql.SparkSession
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // Mirror Bench/Verify session config EXACTLY — a probe under a
      // different session lies. The sf1 rehearsal caught this: rcte1
      // threw RECURSION_ROW_LIMIT_EXCEEDED here while green in Bench,
      // because only Bench lifted the default 1M recursion row valve.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.cteRecursionRowLimit", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args; rep <- 1 to 3) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      graft.operators.Ranks.releaseAll()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"$q rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
