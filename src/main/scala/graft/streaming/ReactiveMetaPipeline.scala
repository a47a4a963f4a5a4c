package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The reference's reactive layer (SURVEY §2.4 D6, §3 EP3) rebuilt on
  * Structured Streaming.
  *
  * Reference behavior: a Dagster `@asset_sensor` polls the event log
  * every ≥10 s (reference: dagster_repository/sensors.py:6-16); each
  * upstream `ticker` materialization triggers one `ticker_meta` run for
  * that partition, `run_key` = partition giving exactly-once semantics
  * (sensors.py:15); the meta job re-scans the whole table per key
  * (resources.py:55-76).
  *
  * Spark-first re-expression:
  *  - the "sensor" is a file-stream source on the upstream table
  *    directory — new files ARE the materialization events; no polling
  *    code, no event log.
  *  - the "run_key" is the streaming checkpoint: a batch is never
  *    replayed into visible state after a restart, and the sink write
  *    is an idempotent overwrite, so re-delivery converges instead of
  *    duplicating (naive append would break exactly-once — SURVEY §7.4).
  *  - the meta aggregate is INCREMENTAL: min/max/count merge in the
  *    streaming state store per key, so each micro-batch does work
  *    proportional to NEW data, not table size. The reference re-scans
  *    everything per trigger; at 100 TB that difference is the whole
  *    ballgame.
  *
  * Triggers: `Trigger.AvailableNow` = catch-up/backfill mode (process
  * everything pending, then stop — used by tests and the verify gate);
  * `Trigger.ProcessingTime("10 seconds")` = the reference's 10 s poll
  * cadence for continuous deployment.
  */
class ReactiveMetaPipeline(
    upstreamDir: String,
    metaDir: String,
    checkpointDir: String) {

  /** Run the reactive meta materialization until all pending upstream
    * data is processed (AvailableNow), writing the per-key meta table
    * to `metaDir`. Returns after the stream stops.
    */
  def runAvailableNow(spark: SparkSession, keyCol: String = "event_type",
                      valueCol: String = "value"): Unit =
    run(spark, Trigger.AvailableNow, keyCol, valueCol).awaitTermination()

  /** Start the pipeline with an arbitrary trigger; caller manages the
    * returned query's lifecycle (used with ProcessingTime in prod-shape
    * deployments).
    */
  def run(spark: SparkSession, trigger: Trigger,
          keyCol: String = "event_type",
          valueCol: String = "value"): org.apache.spark.sql.streaming.StreamingQuery = {
    // Schema must be declared for file-stream sources; reuse the batch
    // footer schema of whatever currently exists upstream.
    val schema = spark.read.parquet(upstreamDir).schema
    val stream = spark.readStream.schema(schema).parquet(upstreamDir)

    // Incremental keyed min/max/count — state store holds one tiny row
    // per key; each micro-batch merges only its own partial aggregates.
    val meta = stream
      .groupBy(col(keyCol))
      .agg(
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"),
        count(lit(1)).as("n_events"))

    meta.writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      // Idempotent sink: complete-mode snapshot overwrites the meta
      // table atomically per batch — re-running a batch after failure
      // rewrites the same result (run_key semantics, sensors.py:15).
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(metaDir)
      }
      .start()
  }
}
