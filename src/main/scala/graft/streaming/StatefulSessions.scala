package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operator: per-user sessionization via
  * `flatMapGroupsWithState` (north-star extension — the reference's
  * only state is the sensor's run_key dedup, SURVEY §2.5; a complete
  * engine needs arbitrary keyed state for CDC, sessionization, and
  * online feature computation).
  *
  * Semantics: events for a user belong to one session while gaps stay
  * under `gapMs`; a session closes when a later event arrives beyond
  * the gap (emitting the closed session) or when processing-time
  * timeout fires. State per key is O(1) — just the open session's
  * bounds — so state-store size is bounded by active users, not by
  * event volume; this is what `session_window` cannot express when
  * you need custom open/close side effects or non-time close rules.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts_ms: Long, value: Double)
  case class OpenSession(start_ms: Long, last_ms: Long, n: Long, sum_value: Double)
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Long, sum_value: Double)

  /** The transition function: fold this micro-batch's events for one
    * user into the open session, emitting any sessions it closes.
    * Pure w.r.t. (state, inputs) → deterministic replay on recovery.
    */
  def updateUser(gapMs: Long, useTimeout: Boolean = true)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(ClosedSession(userId, s.start_ms, s.last_ms, s.n, s.sum_value))
    }
    val sorted = events.toSeq.sortBy(_.ts_ms)
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_ms - s.last_ms < gapMs =>
          open = Some(OpenSession(s.start_ms, e.ts_ms, s.n + 1, s.sum_value + e.value))
        case Some(s) =>
          closed += ClosedSession(userId, s.start_ms, s.last_ms, s.n, s.sum_value)
          open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, e.value))
        case None =>
          open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      if (useTimeout) state.setTimeoutDuration(gapMs)
    }
    closed.result().iterator
  }

  /** Wire the operator over a streaming (or batch, for tests) Dataset
    * of events. Caller starts the query / collects the result.
    *
    * `withTimeout = true` (continuous deployments with a wall-clock
    * trigger) closes idle sessions via processing-time timeout;
    * catch-up runs (`Trigger.AvailableNow`) must pass `false` —
    * processing-time timeouts require a running clock and stall a
    * run-to-completion trigger.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMs: Long = 30 * 60 * 1000L,
                 withTimeout: Boolean = false): Dataset[ClosedSession] = {
    import spark.implicits._
    val timeoutConf =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        updateUser(gapMs, withTimeout))
  }

  /** Gated custom-state sessionization (st6): [[sessionize]] over the
    * events table plus one per-user sentinel event 2×gap past the
    * global max — the sentinel closes every user's final real session
    * (its own session stays open and is never emitted), so the output
    * is the COMPLETE session list, checkable against the
    * gaps-and-islands SQL oracle.
    *
    * Emitted columns are session bounds and counts only: they are
    * order-invariant under same-millisecond ties, whereas a
    * double-sum's accumulation order would not be.
    */
  def sessionsGate(spark: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gapMs = 30 * 60 * 1000L
    val e = graft.Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("value"))
      .as[Event]
    val sentinelMs = e.agg(max(col("ts_ms"))).head().getLong(0) + 2 * gapMs
    val sentinels = e.toDF().select(col("user_id")).distinct()
      .select(col("user_id"), lit(sentinelMs).as("ts_ms"), lit(0.0).as("value"))
      .as[Event]
    sessionize(spark, e.unionByName(sentinels), gapMs)
      .select(col("user_id"),
        date_format(timestamp_millis(col("start_ms")), "yyyy-MM-dd HH:mm:ss.SSS")
          .as("session_start"),
        date_format(timestamp_millis(col("end_ms")), "yyyy-MM-dd HH:mm:ss.SSS")
          .as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }
}
