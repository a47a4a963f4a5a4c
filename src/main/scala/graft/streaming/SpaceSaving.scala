package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SPACE-SAVING heavy hitters as bounded keyed streaming state — the
  * frequency sibling of [[StateTtlCache]] (recency) and the keyed
  * complement of [[StreamingSketch]]'s per-window HLL (cardinality):
  * per key (event type), the top users by event count are maintained
  * in AT MOST `cap` counters however many distinct users flow
  * through. Metwally et al.'s Space-Saving guarantees hold per key:
  *
  *  - monotone over-estimate: true ≤ est ≤ true + err,
  *  - any user with true count > N/cap is guaranteed present,
  *  - with cap ≥ distinct users no eviction ever fires and every
  *    count is EXACT — which is the gate contract (cap 2048 covers
  *    the corpus at every gated SF), so st17 is hash-exact against
  *    the batch groupBy count rather than a weaker rows-only check.
  *    The eviction path is spec-driven synthetically at cap 2.
  *
  * Scale shape: state is O(cap) per key and the summaries are
  * MERGEABLE (pairwise counter merge keeps both bounds), so the
  * 100 TB deployment shards by key exactly like this operator and
  * merges shard summaries at read time. The reference has no
  * frequency state at all; this is the north-star completion of the
  * streaming-sketch family.
  */
object SpaceSaving {

  /** `flush=true` rows are per-key sentinels: they emit the key's
    * current top-k and clear state (run-to-completion drain, same
    * protocol as [[StateTtlCache.Ev]]).
    */
  case class SsEv(event_type: String, user_id: Long, us: Long,
                  event_id: Long, flush: Boolean)
  case class Counter(user_id: Long, est: Long, err: Long)
  case class SsState(counters: Seq[Counter])
  case class TopRow(event_type: String, rank: Int, user_id: Long,
                    est_count: Long, max_err: Long)

  /** One key's fold: O(log cap) per event — a mutable hash map for
    * counter lookup plus a TreeSet keyed (est, user_id) so the
    * eviction victim is the tree head instead of an O(cap) scan.
    * The round-8 sf1 rehearsal motivated both steps: the original
    * immutable-Seq form rebuilt a cap-sized Seq PER EVENT (76 s at
    * sf1); a hash map alone still paid an O(cap) min-scan per
    * eviction, which dominates exactly when the stream outgrows the
    * cap (the regime sketches exist for). Semantics are bit-identical:
    * the batch is sorted by the (us, event_id) total order first,
    * eviction picks the (est, user_id)-minimal counter, the flush
    * sorts, and the persisted counter Seq is user-ordered — so replay
    * after recovery emits identical rows (deterministic eviction).
    */
  def updateType(cap: Int, k: Int)(
      etype: String,
      evs: Iterator[SsEv],
      state: GroupState[SsState]): Iterator[TopRow] = {
    val sorted = evs.toSeq.sortBy(e => (e.us, e.event_id))
    val m = scala.collection.mutable.HashMap.empty[Long, Counter]
    val byEst = scala.collection.mutable.TreeSet.empty[(Long, Long)] // (est, user)
    state.getOption.foreach(_.counters.foreach { c =>
      m(c.user_id) = c; byEst += ((c.est, c.user_id))
    })
    val out = Seq.newBuilder[TopRow]
    sorted.foreach { e =>
      if (e.flush) {
        m.values.toSeq.sortBy(c => (-c.est, c.user_id)).take(k).zipWithIndex
          .foreach { case (c, i) =>
            out += TopRow(etype, i + 1, c.user_id, c.est, c.err)
          }
        m.clear(); byEst.clear()
      } else m.get(e.user_id) match {
        case Some(c) =>
          byEst -= ((c.est, c.user_id)); byEst += ((c.est + 1, c.user_id))
          m(e.user_id) = c.copy(est = c.est + 1)
        case None if m.size < cap =>
          m(e.user_id) = Counter(e.user_id, 1L, 0L); byEst += ((1L, e.user_id))
        case None =>
          // Evict the (est, user_id)-minimal counter — the tree head;
          // the newcomer inherits its estimate as the over-count bound.
          val (vest, vu) = byEst.head
          byEst -= ((vest, vu)); m.remove(vu)
          m(e.user_id) = Counter(e.user_id, vest + 1, vest)
          byEst += ((vest + 1, e.user_id))
      }
    }
    if (m.nonEmpty) state.update(SsState(m.values.toSeq.sortBy(_.user_id)))
    else if (state.exists) state.remove()
    out.result().iterator
  }

  /** Wire the operator over a streaming (or batch, for the gate)
    * Dataset — same dual-mode seam as [[StateTtlCache.cached]].
    */
  def topK(spark: SparkSession, events: Dataset[SsEv],
           cap: Int, k: Int): Dataset[TopRow] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateType(cap, k))
  }

  /** Gated st17: per-event-type top-5 users by event count through
    * the space-saving state, drained by per-type sentinels. cap 2048
    * ≥ distinct users at every gated SF ⇒ exact counts ⇒ the result
    * equals the batch groupBy/count top-k, which is what the oracle
    * states (max_err pinned at 0 on the exact path).
    */
  def topUsersGate(spark: SparkSession, dir: String,
                   cap: Int = 2048, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), lit(false).as("flush"))
      .as[SsEv]
    val sentinels = e.toDF().select(col("event_type")).distinct()
      .select(col("event_type"), lit(-1L).as("user_id"),
        lit(Long.MaxValue).as("us"), lit(Long.MaxValue).as("event_id"),
        lit(true).as("flush"))
      .as[SsEv]
    topK(spark, e.unionByName(sentinels), cap, k)
      .toDF()
      .orderBy(col("event_type"), col("rank"))
  }
}
