package graft

import org.apache.spark.sql.functions._
import graft.operators.{Behavior, Relational, TextAnalysis}

/** Round-9 final widening: sequential patterns (seq1), vocabulary
  * growth (vg1), max-concurrency sweep-line (ov1). Each distributed
  * closed form is replayed brute-force from collected sf0.001 data —
  * the replays use the DEFINITION (pair/triple existence, per-prefix
  * distinct counts, literal per-day counting), not the engine's
  * closed forms, so agreement is evidence the algebra is right.
  */
class Round9dSpec extends SparkSpec {

  private val GapUs = 30L * 60L * 1000000L

  /** (user, sid) sessions of (us, type), engine sessionization rules. */
  private def localSessions(): Seq[Seq[(Long, String)]] = {
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      val out = collection.mutable.ListBuffer[collection.mutable.ListBuffer[(Long, String)]]()
      var prev = Long.MinValue
      for ((_, _, ty, us) <- sorted) {
        if (out.isEmpty || us - prev > GapUs)
          out += collection.mutable.ListBuffer[(Long, String)]()
        out.last += ((us, ty))
        prev = us
      }
      out.map(_.toSeq)
    }.toSeq
  }

  test("seq1: closed-form supports equal brute-force subsequence containment") {
    val sessions = localSessions()
    val types = sessions.flatMap(_.map(_._2)).distinct
    val sup2 = collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    val sup3 = collection.mutable.Map[(String, String, String), Long]().withDefaultValue(0L)
    for (s <- sessions) {
      // brute-force: pattern contained iff events with STRICTLY
      // increasing timestamps carry the types in order
      val p2 = for {
        (ua, a) <- s; (ub, b) <- s if ua < ub
      } yield (a, b)
      p2.distinct.foreach(k => sup2(k) += 1)
      val p3 = for {
        (ua, a) <- s; (ub, b) <- s if ua < ub
        (uc, c) <- s if ub < uc
      } yield (a, b, c)
      p3.distinct.foreach(k => sup3(k) += 1)
    }
    val got = Behavior.frequentSubsequences(spark, sf, minSupport = 1)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val want =
      sup2.toSeq.map { case ((a, b), n) => (s"$a>$b", 2, n) } ++
        sup3.toSeq.map { case ((a, b, c), n) => (s"$a>$b>$c", 3, n) }
    assert(got.sorted.toSeq == want.sorted,
      s"support divergence (got ${got.length}, want ${want.length})")
    // sanity: the data exercises both lengths and multiple types
    assert(types.length >= 3 && got.exists(_._2 == 3))
  }

  test("seq1: anti-monotone — a 3-pattern never outsupports its 2-prefix") {
    val rows = Behavior.frequentSubsequences(spark, sf, minSupport = 1)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val s2 = rows.filter(_._2 == 2).map(r => r._1 -> r._3).toMap
    for ((p, _, n) <- rows if p.count(_ == '>') == 2) {
      val prefix = p.split('>').take(2).mkString(">")
      assert(n <= s2.getOrElse(prefix, 0L), s"$p support $n > prefix $prefix")
    }
  }

  test("vg1: checkpoints equal per-prefix distinct counting") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val toks = docs.map { case (_, t) => t.trim.toLowerCase.split("\\s+").toSeq }
    val n = docs.length
    val step = math.max(1, n / 10)
    // literal definition: distinct over the concatenated prefix
    val want = (1 to n).filter(r => r % step == 0 || r == n).map { r =>
      val prefix = toks.take(r)
      (r.toLong, prefix.map(_.length.toLong).sum, prefix.flatten.distinct.length.toLong)
    }
    val got = TextAnalysis.vocabGrowth(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"vocab growth divergence: $got vs $want")
    // structural: both series strictly ordered and vocab <= tokens
    assert(got.map(_._3).zip(got.map(_._3).tail).forall { case (a, b) => a <= b })
    assert(got.forall { case (_, t, v) => v <= t })
  }

  test("ov1: sweep-line peak equals literal per-day open-interval counting") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).as("s"),
        col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val byPrio = orders.groupBy(_._1)
    val want = byPrio.map { case (prio, os) =>
      val ivs = os.map { case (_, s, k) => (s, s + (k % 60).toInt + 1) }
      val days = ivs.map(_._1).min to ivs.map(_._2).max
      // literal: count open intervals on every day, half-open [s, e)
      val counts = days.map(d => d -> ivs.count { case (s, e) => s <= d && d < e })
      val peak = counts.map(_._2).max
      prio -> (peak.toLong, counts.find(_._2 == peak).get._1)
    }
    val got = Relational.maxConcurrency(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        r.getDate(2).toLocalDate.toEpochDay.toInt)).toMap
    assert(got == want, s"concurrency divergence: $got vs $want")
  }
}
