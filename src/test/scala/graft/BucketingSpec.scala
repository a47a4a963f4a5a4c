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

  test("dynamic partition pruning fires on a partitioned fact x filtered dim join") {
    // The scale feature that turns "join then filter" into "read 1/365
    // of the fact table": the dim-side filter becomes a runtime subquery
    // that prunes fact partitions before any fact file is opened.
    val root = tmpDir("dpp_")
    val events = Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
    events.repartition(col("event_date"))
      .write.partitionBy("event_date").parquet(root + "/fact")
    val dim = events.select(col("event_date")).distinct().limit(1)
      .withColumn("tag", lit("keep"))
    dim.write.parquet(root + "/dim")
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try {
      val fact = spark.read.parquet(root + "/fact")
      val d = spark.read.parquet(root + "/dim").filter(col("tag") === "keep")
      val joined = fact.join(d, Seq("event_date"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"fact scan must carry a dynamicpruning subquery filter:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", prev)
      TmpIO.deleteRecursively(new java.io.File(root))
    }
  }

  test("observe() exposes per-query data-quality metrics without a second scan") {
    // Production observability: named aggregates ride the main query's
    // single pass and surface via the observation handle — the hook a
    // pipeline uses to alert on row counts / null rates per run.
    val obs = new org.apache.spark.sql.Observation("ingest_metrics")
    val out = Tables.events(spark, sf)
      .observe(obs,
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_rows"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"))
      .filter(col("value") > 0)
    val kept = out.count()
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] >= kept && kept > 0)
    assert(m("n_null_value").asInstanceOf[Long] == 0L)
  }
}
