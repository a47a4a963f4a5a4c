package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Streaming MATERIALIZED-VIEW MAINTENANCE: a `foreachBatch` MERGE
  * loop that keeps a per-key aggregate table up to date as new data
  * files arrive — the "incremental view" pattern engines without a
  * transactional MERGE sink implement on plain parquet by writing
  * immutable state VERSIONS (v0, v1, …) and pointing readers at the
  * latest one (a Delta-style table without the log, which is exactly
  * what foreachBatch is for in production Spark).
  *
  * Each micro-batch computes its own map-side-combinable partial
  * aggregate (the stream itself is STATELESS — no watermark, no state
  * store; all history lives in the versioned table), then full-outer
  * merges the partial into the previous version with coalesced adds.
  * Sums accumulate as DECIMAL end to end so every version — and the
  * final gate hash — is independent of row order within batches.
  *
  * Scale shape: state versions are aggregate-cardinality (≪ input);
  * the merge is one key-equi full-outer join per batch. At 100 TB the
  * same loop runs with the state table partitioned by key-hash and
  * only the touched partitions rewritten.
  */
object IncrementalUpsert {

  /** Gated st11: three staged event slices arrive as three
    * micro-batches (maxFilesPerTrigger=1, forced file order); the
    * final state version must equal the one-shot batch aggregate of
    * the whole table — which is the DuckDB oracle.
    */
  def incrementalUpsertGate(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.TmpIO.scratchDir("graft_st11_")
    val upstream = new java.io.File(s"$tmp/upstream"); upstream.mkdirs()
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))

    // Natural-parallelism staging (no coalesce(1) funnel): a slice may
    // split into several consecutive micro-batches, which the
    // full-outer decimal merge below absorbs exactly — the final state
    // version is batch-boundary-invariant.
    (0 until 3).foreach { n =>
      GateIO.stageFiles(e.filter(col("event_id") % 3 === n), tmp, upstream, n + 1)
    }

    val stateRoot = s"$tmp/state"
    var latest = -1L // driver-side pointer to the newest state version
    GateIO.runPinned(spark, 4)(spark.readStream
      .schema("event_id LONG, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(upstream.toString)
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val partial = batch.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(30,6)")).as("s"))
        val merged =
          if (latest < 0) partial
          else {
            val prev = spark.read.parquet(s"$stateRoot/v$latest")
              .select(col("event_type"), col("n").as("pn"), col("s").as("ps"))
            prev.join(partial, Seq("event_type"), "full_outer")
              .select(col("event_type"),
                (coalesce(col("pn"), lit(0L)) + coalesce(col("n"), lit(0L)))
                  .as("n"),
                (coalesce(col("ps"), lit(0).cast("decimal(30,6)"))
                  + coalesce(col("s"), lit(0).cast("decimal(30,6)"))).as("s"))
          }
        // immutable new version; readers of v(latest) are never
        // disturbed — the swap is just the pointer bump below. The
        // frame is BOUNDED control-plane data (one row per distinct
        // event_type), so it writes at whatever parallelism the merge
        // left it with — no single-task funnel, no need for one.
        merged.write.parquet(s"$stateRoot/v$id")
        latest = id
        ()
      }
      .start())

    GateIO.collectAndClean(spark, tmp)(
        spark.read.parquet(s"$stateRoot/v$latest")
          .select(col("event_type"), col("n"),
            round(col("s").cast("double"), 6).as("sum_value")))
      .orderBy(col("event_type"))
  }
}
