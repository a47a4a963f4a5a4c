package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL facade: registers the test tables as temp views so the engine's
  * full surface is reachable from `spark.sql` — the entry point a
  * reference user migrating ad-hoc queries would use. Catalyst planning
  * is identical to the DataFrame API (same unresolved-plan pipeline),
  * so every optimization documented in PERF.md applies unchanged.
  */
object GraftSql {
  def registerAll(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(query)
  }
}
