package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.SessionTimers

/** Event-time timer semantics (st18): emission exactly at the gap
  * timer's watermark crossing, the <=-boundary pin the oracle relies
  * on, and timer persistence across a checkpointed restart.
  */
class SessionTimersSpec extends SparkSpec {
  import spark.implicits._

  private val GapMs = 60000L   // 60 s session gap
  private val DelayS = 60      // 60 s watermark delay

  private def ts(epochSec: Long) = new Timestamp(epochSec * 1000L)

  /** One AvailableNow pass over `inDir` with a shared checkpoint. */
  private def runPass(inDir: String, ckpt: String, outDir: String): Unit = {
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    graft.streaming.RunningStats.rocksdbConf(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP")
        .parquet(inDir)
        .withWatermark("ts", s"$DelayS seconds")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .as[SessionTimers.SEvent]
      SessionTimers.timedSessions(spark, stream, GapMs).toDF()
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .start()
        .awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  private def readSessions(outDir: String): Seq[(Long, Long, Long, Long)] =
    if (!new java.io.File(outDir).exists()) Seq.empty
    else spark.read.parquet(outDir)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("timer boundary: expiry exactly AT the watermark fires (<= semantics)") {
    val dir = tmpDir("st18_boundary_")
    try {
      val t0 = 1700000000L
      // user 1's session ends t0+10 => expiry (t0+70)s in ms.
      // user 2's lone event at t0+130 sets watermark = t0+130-60 = t0+70:
      // exactly the expiry. user 3 (t0+100, expiry t0+160) must NOT fire.
      Seq((1L, ts(t0)), (1L, ts(t0 + 10)), (3L, ts(t0 + 100)),
        (2L, ts(t0 + 130)))
        .toDF("user_id", "ts").coalesce(1).write.parquet(s"$dir/in")
      runPass(s"$dir/in", s"$dir/ckpt", s"$dir/out")
      val got = readSessions(s"$dir/out")
      assert(got == Seq((1L, (t0) * 1000000L, (t0 + 10) * 1000000L, 2L)),
        s"expected exactly user 1's session at the <= boundary, got $got")
    } finally TmpIO.deleteRecursively(new java.io.File(dir))
  }

  test("timers survive a checkpointed restart and fire in a later run") {
    val dir = tmpDir("st18_restart_")
    try {
      val t0 = 1700000000L
      // Run 1: user 1's 2-event session + a low-watermark pacer; the
      // final watermark (t0+30-60 < t0) fires nothing.
      Seq((1L, ts(t0)), (1L, ts(t0 + 10)), (9L, ts(t0 + 30)))
        .toDF("user_id", "ts").coalesce(1).write.parquet(s"$dir/in")
      runPass(s"$dir/in", s"$dir/ckpt", s"$dir/out")
      assert(readSessions(s"$dir/out").isEmpty,
        "nothing may fire below the watermark")
      // Run 2: a single far-future event leaps the watermark to
      // t0+940; the timers REGISTERED IN RUN 1 must fire now —
      // including user 9's (its session was never touched in run 2).
      Seq((9L, ts(t0 + 1000)))
        .toDF("user_id", "ts").coalesce(1).write.mode("append")
        .parquet(s"$dir/in")
      runPass(s"$dir/in", s"$dir/ckpt", s"$dir/out")
      val got = readSessions(s"$dir/out")
      assert(got == Seq(
        (1L, t0 * 1000000L, (t0 + 10) * 1000000L, 2L),
        (9L, (t0 + 30) * 1000000L, (t0 + 30) * 1000000L, 1L)),
        s"run-1 timers must fire after the restart, got $got")
    } finally TmpIO.deleteRecursively(new java.io.File(dir))
  }

  test("in-batch gaps-and-islands: closed sessions await their own timers") {
    val dir = tmpDir("st18_islands_")
    try {
      val t0 = 1700000000L
      // user 5 has TWO sessions inside one batch (gap 60 s exceeded);
      // user 6's far event pushes the watermark over both expiries.
      Seq((5L, ts(t0)), (5L, ts(t0 + 5)), (5L, ts(t0 + 200)),
        (6L, ts(t0 + 2000)))
        .toDF("user_id", "ts").coalesce(1).write.parquet(s"$dir/in")
      runPass(s"$dir/in", s"$dir/ckpt", s"$dir/out")
      val got = readSessions(s"$dir/out")
      assert(got == Seq(
        (5L, t0 * 1000000L, (t0 + 5) * 1000000L, 2L),
        (5L, (t0 + 200) * 1000000L, (t0 + 200) * 1000000L, 1L)),
        s"both islands must emit via their own timers, got $got")
    } finally TmpIO.deleteRecursively(new java.io.File(dir))
  }
}
