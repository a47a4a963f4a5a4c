package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query seconds.
  *
  * Methodology (changed in round 2, see PERF.md):
  *  - every query is materialized through the `noop` sink, not
  *    `.count()`: count() lets Catalyst prune every column the
  *    aggregate doesn't need, so projection-heavy queries were being
  *    timed as little more than the scan. The noop sink evaluates the
  *    full result rows and discards them — write-path overhead without
  *    disk I/O.
  *  - each query runs 3 times and the MEDIAN is reported (min also
  *    emitted), so round-over-round comparisons sit above the ±15%
  *    run-to-run noise observed in round 1.
  *  - the cache catalog is cleared between repetitions: several
  *    operators cache() intermediates internally, and a warm cache
  *    would turn rep-2/3 into a different (smaller) computation.
  */
object Bench {
  private final val Reps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen compiler, shuffle machinery, parquet
    // footer cache) so per-query numbers measure queries, not JVM init.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val timed = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to Reps).map(_ => timeOnce(fn)).sorted
      name -> (runs(Reps / 2), runs.head) // (median, min)
    }
    def jsonMap(sel: ((Double, Double)) => Double): String =
      timed.map { case (k, v) => s"\"" + k + "\":" + sel(v) }.mkString("{", ",", "}")
    val total = timed.map(_._2._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$Reps,""" +
      s""""queries":${jsonMap(_._1)},"queries_min":${jsonMap(_._2)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
