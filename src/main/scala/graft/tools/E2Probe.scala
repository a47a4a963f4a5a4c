package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off variance probe for the e2/e3 bimodal-stall investigation
  * (round-11 verdict item 5): times each component of the jsonExtract
  * plan separately — scan-only, scan+parse, scan+sort, full gate —
  * across many reps in one JVM, so the rep-to-rep spread can be
  * attributed to a stage instead of guessed at. See PERF.md round 11.
  */
object E2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = graft.Tables.events(spark, sf)

    def scanOnly: DataFrame = e.select(col("event_id"))
    def sortOnly: DataFrame = e.select(col("event_id")).orderBy(col("event_id"))
    def parseOnly: DataFrame =
      e.select(col("event_id"), get_json_object(col("props"), "$.k").as("k_val"))
    def full: DataFrame = graft.operators.Relational.jsonExtract(spark, sf)
    def fullTyped: DataFrame = graft.operators.Relational.jsonTyped(spark, sf)

    val variants = Seq(
      "scan" -> (() => scanOnly), "sort" -> (() => sortOnly),
      "parse" -> (() => parseOnly), "e2full" -> (() => full),
      "e3full" -> (() => fullTyped))
    val reps = args.headOption.map(_.toInt).getOrElse(8)
    for ((name, mk) <- variants) {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-8s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
