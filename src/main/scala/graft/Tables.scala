package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver's parquet test tables (TESTDATA.md).
  *
  * Replaces the reference's implicit full-table ORM scans
  * (reference: dagster_repository/resources.py:29,31,58-67) with Spark's
  * vectorized parquet scans — Catalyst pushes filters and prunes columns
  * into the scan, so every downstream operator gets pushdown for free.
  *
  * Scale note: each table is a parquet directory; at 100 TB the same call
  * sites work unchanged — Spark splits files into `maxPartitionBytes`
  * tasks, and partition-pruned layouts (see [[graft.sources.TickerStore]])
  * skip irrelevant directories entirely.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Vectorized columnar scan of one test table (SURVEY §2.1 S3). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    // default; read it as raw nanos (long) and restore a timestamp below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      // integer `div` (not `/`): ns-since-epoch ~1.7e18 exceeds a double's
      // 53-bit mantissa, so floating division would corrupt timestamps.
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
