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
    // events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    // generations and TIMESTAMP(MICROS, NTZ) in others; normalize BOTH to
    // a session-TZ (UTC) TimestampType so every downstream micros/window
    // computation is generation-independent. nanosAsLong makes Spark 4
    // read the NANOS form as a raw long instead of refusing the file.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Normalize `ts` to session-TZ TimestampType whatever the parquet
    * generation shipped (raw nanos long under nanosAsLong, micros-NTZ,
    * or already LTZ). Shared by the batch scan and the file-stream
    * sources that read the raw events file.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      // integer `div` (not `/`): ns-since-epoch ~1.7e18 exceeds a
      // double's 53-bit mantissa; floating division would corrupt.
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // micros-NTZ → LTZ is exact under the UTC session timezone and
      // restores the type every micros/streaming consumer expects.
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
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
