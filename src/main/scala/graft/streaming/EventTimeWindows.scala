package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Analytics.exactSum

/** Event-time windowed aggregation (north-star extension — the
  * reference has no watermarks or event-time windows, SURVEY §2.5; a
  * complete engine needs them for any time-series workload).
  *
  * The same `window()` / `session_window()` expressions run in BOTH
  * batch and streaming plans — the batch form is what the verify gate
  * checks against the oracle; [[streamingHourly]] is the identical
  * aggregation with a watermark for unbounded input.
  *
  * Scale: tumbling windows group to (window, key) — partial aggregation
  * applies, shuffle carries one row per window×key per input partition.
  * Session windows need a per-key sort; Spark plans a single shuffle on
  * the session key. Watermarks bound state: late data beyond 1 hour is
  * dropped instead of growing state forever.
  */
object EventTimeWindows {

  /** Tumbling 1-hour windows per event type: count + exact value sum.
    * Window start is emitted as a formatted string so the oracle
    * comparison is free of timestamp-precision skew (events.ts is
    * nanos; Spark truncates to micros — hour truncation erases the
    * difference, strings erase physical-type drift).
    */
  def hourlyByType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           exactSum(col("value"), 30, 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** Sliding 1-hour windows every 30 minutes per event type — each
    * event lands in exactly 2 windows (Expand: one output row per
    * overlapping window, then the usual two-phase aggregation).
    */
  def slidingByType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"))
      .orderBy(col("win_start"), col("event_type"))

  /** Session windows (30-minute inactivity gap) per user: events per
    * session. The canonical gaps-and-islands computation, expressed as
    * Spark's native `session_window` (state-merging aggregate) instead
    * of a lag/cumsum window cascade.
    */
  def userSessions(spark: SparkSession, dir: String,
                   gap: String = "30 minutes"): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_start"),
        col("user_id"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  /** Streaming form of [[hourlyByType]]: identical aggregation over an
    * unbounded file stream, with a 1-hour watermark bounding state and
    * defining the append-mode emission point.
    */
  def streamingHourly(spark: SparkSession, upstreamDir: String): DataFrame = {
    val schema = spark.read.parquet(upstreamDir).schema
    spark.readStream.schema(schema).parquet(upstreamDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
  }
}
