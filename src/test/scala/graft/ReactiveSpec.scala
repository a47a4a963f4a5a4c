package graft

import org.apache.spark.sql.functions._
import graft.streaming.ReactiveMetaPipeline

class ReactiveSpec extends SparkSpec {

  /** Write a small upstream batch as one parquet file. */
  private def writeBatch(dir: String, rows: Seq[(String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("event_type", "value")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("reactive meta materializes incrementally as upstream files land") {
    val base = tmpDir("reactive_")
    val upstream = s"$base/upstream"; val meta = s"$base/meta"; val ckpt = s"$base/ckpt"

    writeBatch(upstream, Seq(("a", 1.0), ("a", 5.0), ("b", 2.0)))
    val p = new ReactiveMetaPipeline(upstream, meta, ckpt)
    p.runAvailableNow(spark)
    val m1 = spark.read.parquet(meta).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("min_value"), r.getAs[Double]("max_value"), r.getAs[Long]("n_events"))).toMap
    assert(m1 == Map("a" -> (1.0, 5.0, 2L), "b" -> (2.0, 2.0, 1L)))

    // New upstream materialization (the reference's sensor trigger,
    // sensors.py:12-16) → rerun → state merges incrementally.
    writeBatch(upstream, Seq(("a", -3.0), ("c", 9.0)))
    p.runAvailableNow(spark)
    val m2 = spark.read.parquet(meta).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("min_value"), r.getAs[Double]("max_value"), r.getAs[Long]("n_events"))).toMap
    assert(m2 == Map("a" -> (-3.0, 5.0, 3L), "b" -> (2.0, 2.0, 1L), "c" -> (9.0, 9.0, 1L)))
  }

  test("stream metrics listener reports per-batch row counts (K4)") {
    val base = tmpDir("reactive_metrics_")
    val upstream = s"$base/upstream"; val meta = s"$base/meta"; val ckpt = s"$base/ckpt"
    writeBatch(upstream, Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)))
    val m = graft.streaming.StreamMetrics.attach(spark)
    try {
      new ReactiveMetaPipeline(upstream, meta, ckpt).runAvailableNow(spark)
      // listener events are async; wait for delivery
      spark.streams.awaitAnyTermination(1)
      var tries = 0
      while (m.totalRows < 3 && tries < 50) { Thread.sleep(100); tries += 1 }
      assert(m.totalRows == 3, s"expected 3 input rows, got ${m.batches}")
    } finally spark.streams.removeListener(m)
  }

  test("re-running with no new data is a no-op (run_key idempotency)") {
    val base = tmpDir("reactive_idem_")
    val upstream = s"$base/upstream"; val meta = s"$base/meta"; val ckpt = s"$base/ckpt"
    writeBatch(upstream, Seq(("x", 1.0), ("x", 2.0)))
    val p = new ReactiveMetaPipeline(upstream, meta, ckpt)
    p.runAvailableNow(spark)
    p.runAvailableNow(spark) // checkpoint: already-seen files are not replayed
    val m = spark.read.parquet(meta).collect()
    assert(m.length == 1)
    assert(m(0).getAs[Long]("n_events") == 2L, "replay must not double-count")
  }
}
