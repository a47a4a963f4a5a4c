package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Round-14 plan evidence tool: unlike [[graft.PlanProbe]] (which
  * explains the RETURNED frame — a LocalTableScan for gates that
  * materialize bounded results via collect+createDataFrame), this
  * registers a QueryExecutionListener and dumps the formatted plan of
  * EVERY query executed while the gate runs, so the internal
  * exchanges/joins of collected gates are visible and checkable.
  * Usage: runMain graft.tools.PlanDump <gate> [> plans/...] .
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val buf = new java.lang.StringBuilder
    val listener = new QueryExecutionListener {
      private def dump(fn: String, qe: QueryExecution): Unit = buf.synchronized {
        buf.append(s"\n===== execution ($fn) =====\n")
          .append(qe.explainString(org.apache.spark.sql.execution.FormattedMode))
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = dump(funcName, qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = dump(funcName, qe)
    }
    spark.listenerManager.register(listener)
    for (q <- args) {
      buf.setLength(0)
      println(s"===== $q (all executions) =====")
      val df = graft.SparkEntry.queries(q)(spark, sf)
      df.write.format("noop").mode("overwrite").save()
      // listener events are posted asynchronously; give the bus a beat
      Thread.sleep(1500)
      println(buf.toString)
    }
    spark.stop()
  }
}
