package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Run-metadata emission for streaming pipelines — the reference
  * surfaces `{count, last_5_row}` per batch run through Dagster op
  * metadata (SURVEY §2.2 K4, resources.py:52-53); the streaming
  * equivalent is a `StreamingQueryListener` collecting per-batch
  * progress (rows processed, duration) off the query thread — zero
  * cost on the data path.
  */
class StreamMetrics extends StreamingQueryListener {
  case class BatchMetric(batchId: Long, numInputRows: Long, durationMs: Long)

  private val metrics = mutable.ArrayBuffer.empty[BatchMetric]

  def batches: Seq[BatchMetric] = metrics.synchronized(metrics.toSeq)
  def totalRows: Long = batches.map(_.numInputRows).sum

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit =
    metrics.synchronized {
      metrics += BatchMetric(
        event.progress.batchId,
        event.progress.numInputRows,
        Option(event.progress.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L))
    }
}

object StreamMetrics {
  /** Attach a fresh metrics collector to the session. Caller removes it
    * via `spark.streams.removeListener` when done.
    */
  def attach(spark: SparkSession): StreamMetrics = {
    val m = new StreamMetrics
    spark.streams.addListener(m)
    m
  }
}
