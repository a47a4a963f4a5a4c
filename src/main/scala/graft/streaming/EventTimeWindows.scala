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
    graft.Tables.normalizeEventTs(
        spark.readStream.schema(schema).parquet(upstreamDir))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
  }

  /** Gated watermark/late-data proof (st4): an append-mode streaming
    * hourly count where a second micro-batch REPLAYS the earliest
    * hour's events after the watermark has passed them. If the
    * watermark machinery is working, the replayed rows are dropped and
    * the result equals the plain batch aggregation of the events
    * table — which is exactly what the oracle states. If late rows
    * leaked in, the duplicated first-hour counts would hash-mismatch.
    *
    * Staging (file modification times force the micro-batch order with
    * maxFilesPerTrigger=1):
    *   file 1: every event           → watermark advances to max(ts)-1h
    *   file 2: one "bump" event 90min past max(ts) — measured Spark 4
    *           semantics: a late row is only dropped if its window was
    *           evicted in a STRICTLY EARLIER micro-batch (arrival in
    *           the same batch as the eviction still merges), so the
    *           replay must not ride the first eviction batch
    *   file 3: first-hour events again → below watermark → dropped
    *   file 4: one sentinel event 3h past max(ts) → advances the
    *           watermark past every real window so append mode emits
    *           them all; the bump and sentinel windows never finalize
    *           (they sit within 1h of the final watermark), so both
    *           stay invisible to the output.
    */
  def watermarkLateGate(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.TmpIO.scratchDir("graft_st4_")
    val upstream = new java.io.File(s"$tmp/upstream"); upstream.mkdirs()
    val e = Tables.events(spark, dir).select(col("ts"), col("event_type")).cache()
    val bounds = e.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx")).collect()(0)
    val (mn, mx) = (bounds.getTimestamp(0), bounds.getTimestamp(1))

    import spark.implicits._
    // Stage 1 range-ordered on ts (parallel staging write; time-
    // contiguous files keep the progressively-advancing watermark from
    // evicting a window with rows still in a later file — see
    // GateIO.stageFiles). Stage 3's replay rows are late by
    // construction whatever their file split, so it stages at natural
    // parallelism unordered.
    GateIO.stageFiles(e, tmp, upstream, 1, orderBy = Some(col("ts")))
    GateIO.stageFiles(Seq((new java.sql.Timestamp(mx.getTime + 90 * 60000L), "zz_bump"))
      .toDF("ts", "event_type"), tmp, upstream, 2)
    GateIO.stageFiles(
      e.filter(col("ts") < lit(new java.sql.Timestamp(mn.getTime + 3600000L))),
      tmp, upstream, 3)
    GateIO.stageFiles(Seq((new java.sql.Timestamp(mx.getTime + 3 * 3600000L), "zz_sentinel"))
      .toDF("ts", "event_type"), tmp, upstream, 4)

    val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    // Stateful partition count is pinned by the FIRST run against a
    // checkpoint; this gate creates a fresh checkpoint per call, so a
    // small count is safe and cuts per-batch state-store commit
    // overhead (32 stores × 4 batches → 8 × 4). A production stream
    // sizes this to key cardinality, not to the session default.
    GateIO.runPinned(spark, 4)(spark.readStream
      .schema("ts TIMESTAMP, event_type STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(upstream.toString)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .start())
    e.unpersist()
    // Drop the bump/sentinel instrumentation rows HERE, on the batch
    // read-back — any filter inside the streaming plan (before or
    // after the aggregation) gets pushed below the watermark node by
    // Catalyst, silencing the very watermark advances the bump exists
    // to cause. Whether the zz_ windows finalize depends on
    // max(ts)'s minute-of-hour, so they must not leak into the output.
    GateIO.collectAndClean(spark, tmp)(
        spark.read.parquet(out).filter(!col("event_type").startsWith("zz_")))
      .orderBy(col("hour_start"), col("event_type"))
  }
}
