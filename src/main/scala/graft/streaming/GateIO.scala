package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the end-to-end streaming gates (st4/st5/st7/st8):
  * pinned stateful shuffle partitions and eager staging cleanup.
  */
private[streaming] object GateIO {

  /** Run a streaming query with `spark.sql.shuffle.partitions` pinned
    * to `n` for its WHOLE lifetime. The first micro-batch — which pins
    * the state-store partition count into the fresh checkpoint — is
    * planned asynchronously on the stream thread, so the config must
    * stay set until awaitTermination returns; restoring right after
    * start() races the plan and may silently not apply.
    */
  def runPinned(spark: SparkSession, n: Int)(
      start: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try start.awaitTermination()
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Gate read-back + staging cleanup — see [[graft.TmpIO]]. */
  def collectAndClean(spark: SparkSession, tmpRoot: String)(df: DataFrame): DataFrame =
    graft.TmpIO.collectAndClean(spark, tmpRoot)(df)
}
