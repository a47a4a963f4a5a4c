package graft

import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, Event}

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val gap = 30L * 60 * 1000

  /** Run the sessionizer over whatever is pending in `inputDir` with
    * AvailableNow (process everything, then stop), restoring keyed
    * state from `ckpt` — i.e., each call is one incremental deployment
    * of the operator, exactly how it would run in production catch-up.
    */
  private def runOnce(inputDir: String, ckpt: String, outDir: String): Set[ClosedSession] = {
    val src = spark.readStream
      .schema("user_id LONG, ts_ms LONG, value DOUBLE")
      .parquet(inputDir)
      .as[Event]
    val q = StatefulSessions.sessionize(spark, src, gap)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ClosedSession], _: Long) =>
        batch.write.mode("append").parquet(outDir): Unit
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    scala.util.Try(
      spark.read.parquet(outDir).as[ClosedSession].collect().toSet
    ).getOrElse(Set.empty)
  }

  test("stateful sessionization: incremental runs with checkpointed state") {
    val base = tmpDir("sessions_")
    val input = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"

    Seq(Event(1L, 0L, 1.0), Event(1L, 1000L, 2.0), Event(2L, 0L, 7.0))
      .toDS().coalesce(1).write.mode("append").parquet(input)
    val r1 = runOnce(input, ckpt, out)
    assert(r1.isEmpty, "no gap crossed yet: all sessions still open")

    // second deployment: user 1 jumps past the gap → first session closes;
    // user 2 stays open. State must have survived the restart.
    Seq(Event(1L, gap + 2000L, 5.0)).toDS()
      .coalesce(1).write.mode("append").parquet(input)
    val r2 = runOnce(input, ckpt, out)
    assert(r2 == Set(ClosedSession(1L, 0L, 1000L, 2, 3.0)),
      s"got: ${r2.mkString(",")}")

    // third: user 2 crosses the gap too; user 1's open session extends
    Seq(Event(2L, gap * 2, 1.0), Event(1L, gap + 2500L, 1.0)).toDS()
      .coalesce(1).write.mode("append").parquet(input)
    val r3 = runOnce(input, ckpt, out)
    assert(r3 == Set(
      ClosedSession(1L, 0L, 1000L, 2, 3.0),
      ClosedSession(2L, 0L, 0L, 1, 7.0)),
      s"got: ${r3.mkString(",")}")
  }

  test("batch replay of the same fold is deterministic") {
    val events = Seq(
      Event(9L, 0L, 1.0), Event(9L, 10L, 1.0), Event(9L, gap + 20L, 2.0),
      Event(9L, 3 * gap, 3.0)).iterator
    val out = StatefulSessions.updateUser(gap)(9L, events,
      org.apache.spark.sql.streaming.TestGroupState.create[StatefulSessions.OpenSession](
        org.apache.spark.api.java.Optional.empty[StatefulSessions.OpenSession](),
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
        0L, org.apache.spark.api.java.Optional.empty[java.lang.Long]().asInstanceOf[org.apache.spark.api.java.Optional[Long]],
        hasTimedOut = false))
    assert(out.map(s => (s.start_ms, s.end_ms, s.n_events)).toSeq ==
      Seq((0L, 10L, 2L), (gap + 20L, gap + 20L, 1L)))
  }
}
