package graft

import org.apache.spark.sql.functions._

/** Bucketed (co-located) joins: pre-shuffling both fact tables into the
  * same bucket layout at write time eliminates the join shuffle at read
  * time — THE repeated-join optimization at 100 TB (pay the shuffle
  * once on ingest, never again).
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val wh = tmpDir("bucket_wh_")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bdb LOCATION '$wh'")
    try {
      Tables.orders(spark, sf)
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("bdb.orders_b")
      Tables.customer(spark, sf)
        .withColumn("cust_key", col("c_custkey"))
        .write.bucketBy(8, "cust_key").sortBy("cust_key")
        .mode("overwrite").saveAsTable("bdb.customer_b")

      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bdb.orders_b")
          .join(spark.table("bdb.customer_b"),
            col("o_custkey") === col("cust_key"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"))
        val plan = joined.queryExecution.executedPlan.toString
        val joinLines = plan.linesIterator
          .dropWhile(l => !l.contains("SortMergeJoin")).toSeq
        assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
        // no Exchange below the join: bucket layout replaces the shuffle
        assert(!joinLines.exists(_.contains("Exchange hashpartitioning(o_custkey")),
          s"bucketed join must not reshuffle the probe side:\n$plan")
        assert(joined.collect().map(_.getLong(1)).sum ==
          Tables.orders(spark, sf).count())
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bdb.orders_b")
      spark.sql("DROP TABLE IF EXISTS bdb.customer_b")
      spark.sql("DROP DATABASE IF EXISTS bdb")
    }
  }
}
