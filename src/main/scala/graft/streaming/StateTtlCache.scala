package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Bounded keyed state with TTL + LRU eviction — the online
  * feature-cache pattern (last-seen per (user, event_type), capped):
  * state per key is AT MOST `cap` fixed-size entries no matter how
  * many events or distinct types flow through, which is the property
  * that keeps a 100 TB stream's state store from growing without
  * bound. Two eviction rules compose:
  *
  *  - TTL: entries idle longer than `ttlUs` relative to the key's
  *    monotone event clock are purged before each update (event-time
  *    TTL, not wall clock — deterministic and replayable).
  *  - CAPACITY (LRU): when an upsert pushes the entry count past
  *    `cap`, the least-recently-seen entry (by (last_us, event_id)
  *    total order) is evicted.
  *
  * The composition has a closed form the DuckDB oracle can state
  * directly: because the clock is monotone and TTL-dead entries are
  * purged before any capacity check, the final cache content per key
  * is exactly the `cap` most-recently-seen event types among those
  * whose last occurrence lies within TTL of the key's final event —
  * an LRU invariant (eviction always removes the minimum-recency
  * entry, and any evictor has strictly greater recency), so the gate
  * is hash-exact, not a weaker rows-only check.
  *
  * North-star extension: the reference's only keyed state is the
  * sensor run_key dedup (`/root/reference/dagster_repository/
  * sensors.py:15-40`); a complete engine needs bounded keyed state
  * with explicit eviction to run unbounded streams.
  */
object StateTtlCache {

  /** `flush=true` rows are per-key sentinels carrying the key's final
    * clock value: they emit the retained entries and clear state —
    * the run-to-completion analogue of a state-store drain.
    */
  case class Ev(user_id: Long, event_id: Long, us: Long,
                event_type: String, value: Double, flush: Boolean)
  case class Entry(event_type: String, last_us: Long, last_eid: Long,
                   last_value: Double)
  case class Cache(entries: Seq[Entry])
  case class CacheRow(user_id: Long, event_type: String, last_us: Long,
                      last_value: Double)

  /** One key's fold: O(cap) work and O(cap) state per event batch.
    * Deterministic: the batch is sorted by the (us, event_id) total
    * order before folding, so replay after recovery emits the same
    * rows.
    */
  def updateUser(ttlUs: Long, cap: Int)(
      uid: Long,
      evs: Iterator[Ev],
      state: GroupState[Cache]): Iterator[CacheRow] = {
    val sorted = evs.toSeq.sortBy(e => (e.us, e.event_id))
    var entries = state.getOption.map(_.entries).getOrElse(Seq.empty)
    val out = Seq.newBuilder[CacheRow]
    sorted.foreach { e =>
      // TTL purge first: a dead entry must never survive long enough
      // to win a capacity eviction over a live one.
      entries = entries.filter(_.last_us >= e.us - ttlUs)
      if (e.flush) {
        entries.foreach(en =>
          out += CacheRow(uid, en.event_type, en.last_us, en.last_value))
        entries = Seq.empty
      } else {
        entries = entries.filterNot(_.event_type == e.event_type) :+
          Entry(e.event_type, e.us, e.event_id, e.value)
        if (entries.size > cap) {
          val oldest = entries.minBy(en => (en.last_us, en.last_eid))
          entries = entries.filterNot(_.event_type == oldest.event_type)
        }
      }
    }
    if (entries.nonEmpty) state.update(Cache(entries))
    else if (state.exists) state.remove()
    out.result().iterator
  }

  /** Wire the operator over a streaming (or batch, for the gate)
    * Dataset. NoTimeout: eviction is event-time-driven, so catch-up
    * runs (`Trigger.AvailableNow`) need no running clock.
    */
  def cached(spark: SparkSession, events: Dataset[Ev],
             ttlUs: Long, cap: Int): Dataset[CacheRow] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateUser(ttlUs, cap))
  }

  /** Gated st15: the cache drained over the events table — per-user
    * sentinels at the user's OWN final clock value (so the flush-time
    * TTL purge equals the end-of-stream alive check) emit the final
    * retained entries. Output: one row per retained (user, type) with
    * last-seen time and last value, both argmax-carried raw values —
    * no accumulation, so hashing is exact across engines.
    */
  def ttlCacheGate(spark: SparkSession, dir: String,
                   ttlUs: Long = 6L * 3600L * 1000000L,
                   cap: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"), lit(false).as("flush"))
      .as[Ev]
    val sentinels = e.toDF().groupBy(col("user_id"))
      .agg(max(col("us")).as("us"))
      .select(col("user_id"), lit(Long.MaxValue).as("event_id"), col("us"),
        lit("").as("event_type"), lit(0.0).as("value"), lit(true).as("flush"))
      .as[Ev]
    cached(spark, e.unionByName(sentinels), ttlUs, cap)
      .select(col("user_id"), col("event_type"),
        date_format(timestamp_millis(expr("last_us div 1000")),
          "yyyy-MM-dd HH:mm:ss.SSS").as("last_seen"),
        col("last_value"))
      .orderBy(col("user_id"), col("event_type"))
  }
}
