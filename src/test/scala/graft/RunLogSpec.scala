package graft

import org.apache.spark.sql.functions._
import graft.operators.RunLog

class RunLogSpec extends SparkSpec {

  private def freshLog(): (RunLog, String) = {
    val tmp = graft.TmpIO.scratchDir("graft_runlogspec_")
    (new RunLog(s"$tmp/log"), tmp)
  }

  test("concurrent runs all land in the log (TxTable append loop, no lost records)") {
    val (log, tmp) = freshLog()
    try {
      val keys = (0 until 12).map(i => f"2024010$i%02d")
      graft.operators.Schedule.backfill(keys, parallelism = 4) { k =>
        log.runLogged(spark, "j", k)(k.takeRight(2).toLong); ()
      }
      val rows = log.runs(spark).collect()
      assert(rows.length == 12, s"expected 12 run records, got ${rows.length}")
      assert(rows.map(_.getAs[String]("partition")).sorted.toSeq == keys.sorted)
      assert(rows.forall(_.getAs[String]("status") == "SUCCESS"))
    } finally graft.TmpIO.deleteRecursively(new java.io.File(tmp))
  }

  test("failure is logged FAILED with rows 0 and rethrown; retry bumps attempt") {
    val (log, tmp) = freshLog()
    try {
      val e = intercept[RuntimeException] {
        log.runLogged(spark, "j", "d1")(sys.error("boom"))
      }
      assert(e.getMessage == "boom")
      log.runLogged(spark, "j", "d1")(42L)
      val rows = log.runs(spark).orderBy("attempt").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Int]("attempt") == 1
        && rows(0).getAs[String]("status") == "FAILED"
        && rows(0).getAs[Long]("rows_written") == 0L)
      assert(rows(1).getAs[Int]("attempt") == 2
        && rows(1).getAs[String]("status") == "SUCCESS"
        && rows(1).getAs[Long]("rows_written") == 42L)
      val h = log.history(spark).collect().head
      assert(h.getAs[Long]("n_runs") == 2 && h.getAs[Long]("n_failed") == 1
        && h.getAs[String]("last_status") == "SUCCESS"
        && h.getAs[Long]("rows_ok") == 42L)
    } finally graft.TmpIO.deleteRecursively(new java.io.File(tmp))
  }

  test("sync pipeline and stream metrics share the one history surface") {
    val (log, tmp) = freshLog()
    try {
      // Batch ingest run through the logged sync pipeline.
      val store = new graft.sources.TickerStore(s"$tmp/store")
      graft.sources.TickerStore.syncPipelineLogged(
        spark, new graft.sources.SyntheticQuoteSource(),
        Seq("SPY", "QQQ"), "20240102", store, log).collect()
      // Streaming batch trace folded in via the adapter.
      val m = new graft.streaming.StreamMetrics
      val listenerField = m.batches // force init
      assert(listenerField.isEmpty)
      // Drive a real AvailableNow query so the listener sees progress.
      spark.streams.addListener(m)
      try {
        val in = s"$tmp/in"
        spark.range(100).selectExpr("id AS v").write.parquet(in)
        val q = spark.readStream.schema("v LONG").parquet(in)
          .writeStream.format("noop")
          .option("checkpointLocation", s"$tmp/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // Listener events are delivered async off the query thread.
        val deadline = System.nanoTime() + 10000000000L
        while (m.batches.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      } finally spark.streams.removeListener(m)
      assert(m.batches.nonEmpty, "stream progress not observed")
      log.recordStream(spark, "stream_ingest", "20240102", m)
      val h = log.history(spark).orderBy("job").collect()
      assert(h.length == 2, s"both producers must appear: ${h.mkString(",")}")
      val byJob = h.map(r => r.getAs[String]("job") -> r).toMap
      assert(byJob("sync_etf_pipeline").getAs[Long]("rows_ok") == 2L)
      assert(byJob("stream_ingest").getAs[Long]("rows_ok") == 100L)
      assert(h.forall(_.getAs[String]("last_status") == "SUCCESS"))
    } finally graft.TmpIO.deleteRecursively(new java.io.File(tmp))
  }

  test("rh2: per-day attempt rows consolidate to exact day counts " +
       "whatever the micro-batch slicing") {
    import org.apache.spark.sql.functions._
    val expected = Tables.events(spark, sf)
      .groupBy(date_format(to_date(col("ts")), "yyyyMMdd").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.operators.RunLog.streamRunHistoryGate(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.map(_._1).toSeq == expected.keys.toSeq.sorted,
      "one consolidated row per day, day-ordered")
    got.foreach { case (day, n, status) =>
      assert(n == expected(day), s"day $day: stream attempts must sum " +
        s"to the day's event count regardless of batch boundaries")
      assert(status == "SUCCESS")
    }
  }
}
