package graft

import org.apache.spark.sql.streaming.Trigger
import graft.streaming.RunningStats
import graft.streaming.RunningStats.{Event, UserStats}

class RunningStatsSpec extends SparkSpec {
  import spark.implicits._

  private def runOnce(in: String, ckpt: String, out: String): Map[Long, UserStats] = {
    RunningStats.rocksdbConf(spark)
    try {
      val src = spark.readStream
        .schema("user_id LONG, value DOUBLE").parquet(in).as[Event]
      val q = RunningStats.runningStats(spark, src)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[UserStats], id: Long) =>
          b.withColumn("batch", org.apache.spark.sql.functions.lit(id))
            .write.mode("append").parquet(out): Unit
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // latest emission per user = the running value
      val df = spark.read.parquet(out)
      df.as[(Long, Long, Double, Double, Double, Long)].collect()
        .groupBy(_._1).map { case (u, rs) =>
          val latest = rs.maxBy(_._6)
          u -> UserStats(latest._1, latest._2, latest._3, latest._4, latest._5)
        }.toMap
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState running stats accumulate across deployments") {
    val base = tmpDir("tws_")
    val in = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"

    Seq(Event(1L, 2.0), Event(1L, 8.0), Event(2L, 5.0)).toDS()
      .coalesce(1).write.mode("append").parquet(in)
    val r1 = runOnce(in, ckpt, out)
    assert(r1(1L) == UserStats(1L, 2, 10.0, 2.0, 8.0), s"got ${r1(1L)}")
    assert(r1(2L) == UserStats(2L, 1, 5.0, 5.0, 5.0))

    // second deployment: RocksDB state restored from checkpoint
    Seq(Event(1L, -1.0)).toDS().coalesce(1).write.mode("append").parquet(in)
    val r2 = runOnce(in, ckpt, out)
    assert(r2(1L) == UserStats(1L, 3, 9.0, -1.0, 8.0), s"got ${r2(1L)}")
    assert(r2(2L) == UserStats(2L, 1, 5.0, 5.0, 5.0))
  }
}
