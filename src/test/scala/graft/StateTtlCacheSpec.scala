package graft

import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StateTtlCache
import graft.streaming.StateTtlCache.{CacheRow, Ev}

/** LRU+TTL bounded keyed state: crafted-sequence semantics, the
  * cap bound itself, and checkpointed incremental-deployment
  * equivalence with the one-shot batch fold (the property that makes
  * the st15 gate's closed-form oracle valid for a real stream).
  */
class StateTtlCacheSpec extends SparkSpec {
  import spark.implicits._

  private val ttl = 1000L // us, for crafted sequences
  private val cap = 2

  private def run(evs: Seq[Ev]): Set[CacheRow] =
    StateTtlCache.cached(spark, evs.toDS(), ttl, cap).collect().toSet

  private def flush(uid: Long, us: Long) =
    Ev(uid, Long.MaxValue, us, "", 0.0, flush = true)

  test("LRU: capacity eviction removes the least-recently-seen type") {
    val out = run(Seq(
      Ev(1, 1, 100, "a", 1.0, flush = false),
      Ev(1, 2, 200, "b", 2.0, flush = false),
      Ev(1, 3, 300, "c", 3.0, flush = false), // cap 2: evicts a
      flush(1, 300)))
    assert(out == Set(CacheRow(1, "b", 200, 2.0), CacheRow(1, "c", 300, 3.0)))
  }

  test("LRU: an upsert refreshes recency and dodges eviction") {
    val out = run(Seq(
      Ev(1, 1, 100, "a", 1.0, flush = false),
      Ev(1, 2, 200, "b", 2.0, flush = false),
      Ev(1, 3, 300, "a", 9.0, flush = false), // a now newest
      Ev(1, 4, 400, "c", 3.0, flush = false), // evicts b, not a
      flush(1, 400)))
    assert(out == Set(CacheRow(1, "a", 300, 9.0), CacheRow(1, "c", 400, 3.0)))
  }

  test("TTL: idle entries are purged by the event clock; flush re-checks") {
    val out = run(Seq(
      Ev(1, 1, 100, "a", 1.0, flush = false),
      Ev(1, 2, 1500, "b", 2.0, flush = false), // a idle 1400 > ttl: purged
      flush(1, 1500)))
    assert(out == Set(CacheRow(1, "b", 1500, 2.0)))
    // TTL purge at flush time: b alive at its own event, dead by the
    // sentinel clock when the key's last event is much later.
    val out2 = run(Seq(
      Ev(2, 1, 100, "b", 2.0, flush = false),
      Ev(2, 2, 5000, "c", 3.0, flush = false),
      flush(2, 5000)))
    assert(out2 == Set(CacheRow(2, "c", 5000, 3.0)))
  }

  test("TTL then re-insert: an evicted type returns with fresh recency") {
    val out = run(Seq(
      Ev(1, 1, 100, "a", 1.0, flush = false),
      Ev(1, 2, 2000, "a", 7.0, flush = false), // purged then re-inserted
      flush(1, 2000)))
    assert(out == Set(CacheRow(1, "a", 2000, 7.0)))
  }

  test("same-microsecond ties resolve by event_id (total order)") {
    val out = run(Seq(
      Ev(1, 10, 100, "a", 1.0, flush = false),
      Ev(1, 11, 100, "b", 2.0, flush = false),
      Ev(1, 12, 100, "c", 3.0, flush = false), // evicts a (lowest eid)
      flush(1, 100)))
    assert(out == Set(CacheRow(1, "b", 100, 2.0), CacheRow(1, "c", 100, 3.0)))
  }

  test("per-key output never exceeds cap on the real events table") {
    val rows = StateTtlCache.ttlCacheGate(spark, sf).collect()
    assert(rows.nonEmpty)
    val perUser = rows.groupBy(_.getLong(0)).values.map(_.length)
    assert(perUser.max <= 3)
  }

  test("checkpointed incremental runs equal the one-shot batch fold") {
    val base = tmpDir("ttlcache_")
    val input = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    val batch1 = Seq(
      Ev(1, 1, 100, "a", 1.0, flush = false),
      Ev(1, 2, 200, "b", 2.0, flush = false),
      Ev(2, 3, 100, "a", 5.0, flush = false))
    val batch2 = Seq(
      Ev(1, 4, 300, "c", 3.0, flush = false), // LRU-evicts a ACROSS the restart
      Ev(2, 5, 5000, "b", 6.0, flush = false)) // TTL-purges 2/a across restart
    val batch3 = Seq(flush(1, 300), flush(2, 5000))

    def runOnce(evs: Seq[Ev]): Set[CacheRow] = {
      evs.toDS().coalesce(1).write.mode("append").parquet(input)
      val src = spark.readStream
        .schema("user_id LONG, event_id LONG, us LONG, event_type STRING, value DOUBLE, flush BOOLEAN")
        .parquet(input)
        .as[Ev]
      val q = StateTtlCache.cached(spark, src, ttl, cap)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[CacheRow], _: Long) =>
          b.write.mode("append").parquet(out): Unit
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      scala.util.Try(
        spark.read.parquet(out).as[CacheRow].collect().toSet
      ).getOrElse(Set.empty)
    }
    assert(runOnce(batch1).isEmpty, "nothing flushed yet")
    assert(runOnce(batch2).isEmpty, "state mutates silently across restarts")
    val streamed = runOnce(batch3)
    val oneShot = run(batch1 ++ batch2 ++ batch3)
    assert(streamed == oneShot, s"streamed=$streamed oneShot=$oneShot")
    assert(streamed == Set(
      CacheRow(1, "b", 200, 2.0), CacheRow(1, "c", 300, 3.0),
      CacheRow(2, "b", 5000, 6.0)))
    TmpIO.deleteRecursively(new java.io.File(base))
  }
}
