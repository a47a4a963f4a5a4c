package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SEQUENTIAL TESTING AS STREAMING STATE (st19) — the online form of
  * the batch Wald SPRT (`Stats.sprtGate`): per variant, O(1) keyed
  * state (events seen, successes, first crossing) folds the
  * log-likelihood walk as events arrive, so the "stop the experiment
  * NOW" signal exists the moment the boundary is crossed instead of
  * at the nightly batch. This is what a sequential readout is FOR —
  * the batch gate can only say where the walk would have stopped;
  * the stream stops.
  *
  * Determinism: sprt1's pre-rounded Wald weights, held in 1e-6 UNITS
  * (exact longs — ln evaluated on four constants at design time, no
  * arithmetic beyond integer multiply-add per event). The stream's
  * final rows therefore hash against the SAME DuckDB oracle as the
  * batch gate: batch ≡ stream is checked by the driver, not asserted.
  *
  * Scale shape: state is 4 longs + a string per variant regardless of
  * stream length; per-batch work is one sort of the batch's per-key
  * slice (the total-order contract every stateful gate here uses).
  *
  * DELIVERY-ORDER CONTRACT: [[update]] sorts only the CURRENT
  * trigger's per-key slice by (event time, id) before folding — an
  * event that arrives in a LATER micro-batch with an EARLIER
  * timestamp folds into the LLR walk out of order, because an SPRT
  * walk is a running decision and already-emitted crossings cannot be
  * retracted. Batch ≡ stream therefore holds only under in-order
  * delivery per variant (e.g. a per-key FIFO source, or an upstream
  * watermark-buffered sort such as EventTimeWindows' pattern that
  * releases rows only below the watermark). A deployment on an
  * out-of-order source must add that buffering stage first; the gate
  * stages its input as one AvailableNow batch, which satisfies the
  * contract by construction.
  */
object StreamSprt {

  /** Wald weights/threshold in 1e-6 units: ln(0.25/0.15), ln(0.75/0.85),
    * ln(0.95/0.05) — pinned constants shared with `Stats.sprtGate`.
    */
  final val L1: Long = 510826L
  final val L2: Long = -125163L
  final val Bound: Long = 2944439L

  /** `flush=true` rows are per-variant sentinels (us = MaxValue sorts
    * last): emit the variant's verdict and clear state.
    */
  case class Ev(variant: Long, us: Long, event_id: Long, succ: Long,
                flush: Boolean)
  case class SprtState(i: Long, s: Long, crossedAt: Long, decision: String)
  case class SprtRow(variant: Long, n_events: Long, n_success: Long,
                     decision: String, crossed_at: Long, llr_units: Long)

  def update(variant: Long, evs: Iterator[Ev],
             state: GroupState[SprtState]): Iterator[SprtRow] = {
    val sorted = evs.toSeq.sortBy(e => (e.us, e.event_id))
    var st = state.getOption.getOrElse(SprtState(0L, 0L, 0L, "continue"))
    val out = Seq.newBuilder[SprtRow]
    sorted.foreach { e =>
      if (e.flush) {
        out += SprtRow(variant, st.i, st.s, st.decision, st.crossedAt,
          st.s * L1 + (st.i - st.s) * L2)
        st = SprtState(0L, 0L, 0L, "continue")
      } else {
        val i = st.i + 1
        val s = st.s + e.succ
        val llr = s * L1 + (i - s) * L2
        val (ca, dec) =
          if (st.crossedAt == 0L && (llr >= Bound || llr <= -Bound))
            (i, if (llr >= Bound) "accept_h1" else "accept_h0")
          else (st.crossedAt, st.decision)
        st = SprtState(i, s, ca, dec)
      }
    }
    if (st.i > 0) state.update(st)
    else if (state.exists) state.remove()
    out.result().iterator
  }

  /** The operator over a streaming (or batch, for the gate) Dataset —
    * the dual-mode seam every stateful gate here uses.
    */
  def walk(spark: SparkSession, events: Dataset[Ev]): Dataset[SprtRow] = {
    import spark.implicits._
    events
      .groupByKey(_.variant)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        update)
  }

  /** Gated st19: the events table walked through the streaming-state
    * form, drained by per-variant sentinels. Emits EXACTLY the batch
    * gate's columns, so the driver checks it against the SAME oracle —
    * the batch ≡ stream equivalence is part of the hash.
    */
  def sprtStreamGate(spark: SparkSession, dir: String,
                     variants: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = graft.Tables.events(spark, dir)
      .select((col("user_id") % variants).as("variant"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("succ"),
        lit(false).as("flush"))
      .as[Ev]
    val sentinels = e.toDF().select(col("variant")).distinct()
      .select(col("variant"), lit(Long.MaxValue).as("us"),
        lit(Long.MaxValue).as("event_id"), lit(0L).as("succ"),
        lit(true).as("flush"))
      .as[Ev]
    walk(spark, e.unionByName(sentinels))
      .toDF()
      .select(col("variant"), col("n_events"), col("n_success"),
        col("decision"), col("crossed_at"),
        round(col("llr_units").cast("double") / lit(1e6), 6).as("final_llr"))
      .orderBy(col("variant"))
  }
}
