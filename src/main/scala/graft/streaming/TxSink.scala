package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.TxTable

/** Gated st14: EXACTLY-ONCE streaming ingest into the [[TxTable]]
  * commit log — the end-to-end form of the table's idempotent-commit
  * protocol under REAL micro-batch re-delivery.
  *
  * Sink contract: `foreachBatch` pins each micro-batch to table
  * version `batchId + 1` via [[TxTable.commitIfAbsent]]. Spark's
  * at-least-once foreachBatch + an idempotent versioned commit =
  * exactly-once table contents; a re-delivered batch loses the
  * create-exclusive manifest race against its first delivery and
  * becomes a no-op (its staged files are removed again).
  *
  * The gate FORCES the failure mode instead of hoping it happens:
  * after the first AvailableNow run completes, it truncates the
  * checkpoint's `commits/` log (the crash window: offsets WAL written,
  * commit marker not) and restarts the stream on the SAME checkpoint —
  * Spark then re-plans every batch from the offsets WAL with identical
  * batch ids and contents, re-delivering the whole stream through the
  * recovery path. The final table must equal ONE copy of the upstream;
  * any duplicate append hash-fails against the plain batch oracle.
  *
  * Scale shape: the sink adds one O(1) manifest publish per
  * micro-batch on top of the batch's own parquet write; recovery cost
  * is re-reading re-delivered batches, never table history.
  */
object TxSink {

  def streamTxSinkGate(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.TmpIO.scratchDir("graft_st14_")
    val upstream = new java.io.File(s"$tmp/upstream"); upstream.mkdirs()
    val e = Tables.events(spark, dir).select(col("event_id"), col("event_type"))

    // Three staged slices with pinned mod times → deterministic
    // micro-batch ORDER under maxFilesPerTrigger=1. Natural-parallelism
    // staging (no coalesce(1) funnel): a slice splitting into several
    // consecutive batches changes batch ids, not the exactly-once
    // table contents — commitIfAbsent dedupes per batch id and the
    // final table is the union either way.
    (0 until 3).foreach(n =>
      GateIO.stageFiles(e.filter(col("event_id") % 3 === n), tmp, upstream, n))

    val table = new TxTable(s"$tmp/table")
    val ckpt = s"$tmp/ckpt"
    def run(): Unit = GateIO.runPinned(spark, 4)(
      spark.readStream
        .schema("event_id BIGINT, event_type STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(upstream.toString)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          table.commitIfAbsent(batch, id + 1); ()
        }
        .start())

    run()
    // Crash-replay injection: offsets WAL intact, commit markers gone —
    // the restart re-delivers EVERY batch with identical ids/contents.
    Option(new java.io.File(s"$ckpt/commits").listFiles())
      .getOrElse(Array.empty).foreach(_.delete())
    run()

    GateIO.collectAndClean(spark, tmp)(
        table.snapshot(spark)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("event_id")).cast("bigint").as("sum_event_id")))
      .orderBy(col("event_type"))
  }
}
