package graft

import java.sql.Timestamp
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamJoins

class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  // base well above epoch 0: the initial stream watermark is epoch 0,
  // and an event AT the watermark sits on the late-data boundary
  private val base2024 = 1704067200000L // 2024-01-01T00:00:00Z
  private def ts(min: Int): Timestamp = new Timestamp(base2024 + min * 60000L)

  test("watermarked stream-stream join attributes purchases to recent clicks") {
    val base = tmpDir("ssj_")
    val clicksDir = s"$base/clicks"; val purchasesDir = s"$base/purchases"
    val outDir = s"$base/out"; val ckpt = s"$base/ckpt"

    Seq((1L, ts(0), 100L), (1L, ts(50), 101L), (2L, ts(5), 200L))
      .toDF("user_id", "ts", "click_id")
      .coalesce(1).write.parquet(clicksDir)
    Seq(
      (1L, ts(20), 1000L, 9.99),   // 20min after click 100 → attributed
      (1L, ts(55), 1001L, 5.00),   // 5min after click 101 → attributed
      (2L, ts(50), 2000L, 1.00))   // 45min after click 200 → outside 30min
      .toDF("user_id", "ts", "purchase_id", "amount")
      .coalesce(1).write.parquet(purchasesDir)

    val q = StreamJoins.purchaseAttribution(spark, clicksDir, purchasesDir)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir): Unit
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.read.parquet(outDir)
      .select("purchase_id", "click_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got == Set(1000L -> 100L, 1001L -> 101L),
      s"got: $got")
  }

  test("streaming dedup suppresses duplicate keys within the watermark") {
    val base = tmpDir("sdd_")
    val in = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    Seq(
      (1L, ts(0), 10L, 1.0), (1L, ts(1), 10L, 1.0), // dup event_id=1
      (2L, ts(2), 11L, 2.0), (1L, ts(3), 10L, 1.0)) // and again
      .toDF("event_id", "ts", "user_id", "value")
      .coalesce(1).write.parquet(in)
    val q = StreamJoins.dedupStream(spark, in)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir): Unit
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.read.parquet(outDir).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L), s"got: $ids")
  }
}
