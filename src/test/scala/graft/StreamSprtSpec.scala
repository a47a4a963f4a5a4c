package graft

import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamSprt
import graft.streaming.StreamSprt.{Ev, SprtRow}

/** Streaming SPRT state: crafted crossing semantics and checkpointed
  * incremental-deployment equivalence with the one-shot batch fold
  * (the property that lets the st19 gate share sprt1's oracle).
  */
class StreamSprtSpec extends SparkSpec {
  import spark.implicits._

  private def run(evs: Seq[Ev]): Seq[SprtRow] =
    StreamSprt.walk(spark, evs.toDS()).collect().toSeq.sortBy(_.variant)

  private def ev(v: Long, us: Long, succ: Long) =
    Ev(v, us, us, succ, flush = false)
  private def flush(v: Long) =
    Ev(v, Long.MaxValue, Long.MaxValue, 0L, flush = true)

  test("crossing fires at the first boundary hit and is sticky") {
    // 6 successes in a row: llr = 6*0.510826 = 3.064956 >= 2.944439
    // exactly at the 6th event; later failures cannot un-cross.
    val out = run((1 to 6).map(i => ev(1, i, 1)) ++
      (7 to 30).map(i => ev(1, i, 0)) :+ flush(1))
    assert(out === Seq(SprtRow(1, 30, 6,
      "accept_h1", 6, 6 * StreamSprt.L1 + 24 * StreamSprt.L2)))
  }

  test("h0 boundary: a long failure run crosses downward") {
    // k failures: llr = -0.125163k <= -2.944439 at k = 24
    val out = run((1 to 30).map(i => ev(2, i, 0)) :+ flush(2))
    assert(out.head.decision === "accept_h0")
    assert(out.head.crossed_at === 24)
  }

  test("no crossing: verdict stays 'continue' with crossed_at 0") {
    val out = run(Seq(ev(3, 1, 1), ev(3, 2, 0), ev(3, 3, 1), flush(3)))
    assert(out === Seq(SprtRow(3, 3, 2, "continue", 0,
      2 * StreamSprt.L1 + StreamSprt.L2)))
  }

  test("checkpointed incremental runs equal the one-shot batch fold") {
    val base = tmpDir("streamsprt_")
    val input = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    // crossing happens INSIDE batch 2, after a restart carried state
    val batch1 = (1L to 4L).map(i => ev(7, i, 1))
    val batch2 = (5L to 8L).map(i => ev(7, i, 1))
    val batch3 = Seq(flush(7))

    def runOnce(evs: Seq[Ev]): Unit = {
      evs.toDS().coalesce(1).write.mode("append").parquet(input)
      val src = spark.readStream
        .schema("variant LONG, us LONG, event_id LONG, succ LONG, flush BOOLEAN")
        .parquet(input)
        .as[Ev]
      val q = StreamSprt.walk(spark, src)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[SprtRow], _: Long) =>
          b.write.mode("append").parquet(out): Unit
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce(batch1); runOnce(batch2); runOnce(batch3)
    val streamed = spark.read.parquet(out).as[SprtRow].collect().toSeq
    val oneShot = run(batch1 ++ batch2 ++ batch3)
    assert(streamed === oneShot)
    assert(streamed.head.crossed_at === 6,
      "the crossing index must count across the restart boundary")
    TmpIO.deleteRecursively(new java.io.File(base))
  }
}
