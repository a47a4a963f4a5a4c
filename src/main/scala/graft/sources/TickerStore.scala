package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only partitioned table store — the engine's sink layer
  * (SURVEY §2.2 K1–K3, §2.4 D3/D4).
  *
  * Reference semantics re-expressed:
  *  - K1 append insert: row-at-a-time ORM `session.add` loop
  *    (reference: dagster_repository/resources.py:40-53, main.py:74-91)
  *    → one distributed columnar `write.mode(Append)`; every executor
  *    writes its partition's files in parallel.
  *  - K2 auto-create DDL (reference: resources.py:22-26) → first append
  *    creates the table directory; schema travels in parquet footers.
  *  - Autoincrement id + created_at/updated_at defaults
  *    (reference: models.py:8,18-19) → `monotonically_increasing_id()`
  *    (unique across partitions without coordination — a global
  *    sequence would serialize every writer at scale) and
  *    `current_timestamp()`.
  *  - D4 daily partitions (reference: jobs.py:20-38, partition string
  *    yyyyMMdd) → hive-style `partitionBy(partition_date)` directory
  *    layout, so date predicates become partition PRUNING: a query for
  *    one day of a 100 TB table lists one directory, reads ~1/365th.
  *
  * Idempotent backfill (the reference's `run_key` dedup,
  * sensors.py:15): [[overwritePartition]] uses dynamic partition
  * overwrite — re-running a day replaces exactly that day's files,
  * never touching other partitions and never duplicating rows.
  */
class TickerStore(val tableDir: String) {

  /** Columns the store adds on write (reference: models.py:8,18-19). */
  private def withDefaults(df: DataFrame): DataFrame =
    df.withColumn("id", monotonically_increasing_id())
      .withColumn("created_at", current_timestamp())
      .withColumn("updated_at", current_timestamp())

  /** K1/K2 — append a batch, stamped with its partition date. */
  def append(df: DataFrame, date: String): Unit =
    withDefaults(df)
      .withColumn("partition_date", lit(date))
      .write.mode(SaveMode.Append)
      .partitionBy("partition_date")
      .parquet(tableDir)

  /** Idempotent per-partition rewrite (run_key semantics): dynamic
    * partition overwrite replaces only the partitions present in `df`.
    */
  def overwritePartition(df: DataFrame, date: String): Unit =
    withDefaults(df)
      .withColumn("partition_date", lit(date))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("partition_date")
      .parquet(tableDir)

  /** Full-table scan (S3). Partition-date predicates applied by the
    * caller prune directories before any file is opened. The partition
    * column is pinned back to string — hive-style directory values like
    * `20221001` would otherwise be type-inferred as int on read.
    */
  def read(spark: SparkSession): DataFrame =
    spark.read.parquet(tableDir)
      .withColumn("partition_date", col("partition_date").cast("string"))

  /** Partition-pruned scan of one day (D4). */
  def readPartition(spark: SparkSession, date: String): DataFrame =
    read(spark).filter(col("partition_date") === lit(date))
}

object TickerStore {
  /** EP2 end-to-end (reference: jobs.py:7-12 `sync_etf_pipeline` —
    * fetch → append → summary): the reference's whole ingest graph as
    * one lazy Spark plan plus one distributed write.
    */
  def syncPipeline(spark: SparkSession, source: QuoteSource,
                   symbols: Seq[String], date: String,
                   store: TickerStore): DataFrame = {
    store.append(source.fetch(spark, symbols).toDF(), date)
    // K4 run-metadata (reference: resources.py:52-53): count + 5 most
    // recent — served from the table we just wrote.
    store.read(spark)
      .orderBy(desc("created_at"), asc("id"))
      .limit(5)
  }

  /** [[syncPipeline]] recorded into the consolidated run-history
    * surface ([[graft.operators.RunLog]]) — the reference's dagit run
    * log analogue: one attempt row per sync (rows_written = the
    * fetched batch size), failures logged FAILED and rethrown.
    */
  def syncPipelineLogged(spark: SparkSession, source: QuoteSource,
                         symbols: Seq[String], date: String,
                         store: TickerStore,
                         log: graft.operators.RunLog): DataFrame = {
    log.runLogged(spark, "sync_etf_pipeline", date) {
      val batch = source.fetch(spark, symbols).toDF()
      store.append(batch, date)
      batch.count()
    }
    store.read(spark)
      .orderBy(desc("created_at"), asc("id"))
      .limit(5)
  }
}
