package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Iterative graph analytics over relational edge lists.
  *
  * The reference has no graph operators (its dataflow DAG is static,
  * reference: dagster_repository/jobs.py:14-30); these are north-star
  * additions for corpus curation — link-graph centrality is the
  * classic web-crawl quality prior (ranking domains/pages before
  * text filtering), and it exercises the BSP iterate-join-aggregate
  * shape that any 100 TB graph pass needs.
  *
  * Scale shape: each PageRank iteration is one shuffle join of the
  * edge list against the current rank vector (keyed on src) plus one
  * aggregation (keyed on dst). The edge list is hash-partitioned on
  * src once and persisted, so every iteration reuses that exchange;
  * ranks are small relative to edges and flow through the join. The
  * driver only sees the node-count scalar. Convergence loops at
  * depth >3 should `localCheckpoint` every few rounds to truncate
  * lineage (same policy as [[Dedup.duplicateClusters]]).
  *
  * Determinism (cross-engine gate): per-edge contributions are
  * rounded to 14 decimals and summed as DECIMAL(30,14) — exact and
  * order-independent — before the damping update runs in doubles,
  * so Spark and DuckDB iterate bit-identical rank vectors.
  */
object Graph {

  /** PageRank over the bipartite customer↔supplier trade graph
    * (query pr1): an edge per distinct (customer, supplier) trade
    * relationship, both directions so the chain is ergodic; 3
    * damped iterations; top-k hub nodes.
    */
  def pageRank(spark: SparkSession, dir: String,
               iterations: Int = 3, k: Int = 25): DataFrame = {
    val pairs = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(
        concat(lit("c"), col("o_custkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      .distinct()
    val edges = pairs
      .unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
      // one exchange, reused by every iteration's src-keyed join
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("node")).distinct()
    val n = nodes.count().toDouble // control-plane scalar
    val base = 0.15 / n

    var pr = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      pr = edges
        .join(pr, edges("src") === pr("node"))
        .join(deg, "src")
        .select(col("dst"),
          round(col("pr") / col("deg"), 14)
            .cast("decimal(30,14)").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"),
          (lit(base) + lit(0.85) * col("s").cast("double")).as("pr"))
      pr.persist(StorageLevel.MEMORY_AND_DISK)
    }

    pr.select(col("node"), round(col("pr"), 12).as("pr"))
      .orderBy(desc("pr"), asc("node"))
      .limit(k)
  }
}
