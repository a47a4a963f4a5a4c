package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate for the DSv2 MICRO-BATCH source
  * ([[graft.sources.v2.QuoteMicroBatchStream]]): the reference's
  * sensor/poll loop run as a genuine Structured Streaming query.
  */
object V2StreamSource {

  /** Gated st13: readStream from the custom V2 connector — 3 poll
    * rounds × the nation-name symbol universe, AvailableNow, an
    * idempotent parquet sink, then a per-symbol poll count off the
    * sink. Offsets are round counters persisted in the checkpoint, so
    * the count per symbol equals the round cap EXACTLY: a dropped or
    * replayed micro-batch would break the hash against the oracle's
    * closed-form rounds × nation grid.
    */
  def v2StreamGate(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val tmp = graft.TmpIO.scratchDir("graft_st13_")
    val symbols = graft.Tables.nation(spark, dir)
      .select(col("n_name")).collect().map(_.getString(0))
    val stream = spark.readStream
      .format("graft.sources.v2.QuoteDataSource")
      .option("symbols", symbols.mkString(","))
      .option("rounds", rounds.toString)
      .load()
    val out = s"$tmp/out"
    GateIO.runPinned(spark, 4)(stream
      .select(col("symbol"), col("market_price"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .start())
    // Aggregate BEFORE the bounded collect: the raw poll log is
    // corpus-sized, the per-symbol count is symbol-bounded.
    GateIO.collectAndClean(spark, tmp)(
        spark.read.parquet(out)
          .groupBy(col("symbol"))
          .agg(count(lit(1)).as("n_polls")))
      .orderBy(col("symbol"))
  }
}
