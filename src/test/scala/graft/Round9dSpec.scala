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

  test("att2: quantized chain equals a naive sequential replay of the definition") {
    // Independent path: journeys rebuilt with plain loops, removal and
    // absorption replayed with the same quantization contract.
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans = collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    for ((_, rows) <- ev.groupBy(_._1)) {
      val sorted = rows.sortBy(r => (r._4, r._2)).map(_._3).toList
      val cutIdx = sorted.indexOf("purchase")
      val seq0 = if (cutIdx >= 0) sorted.take(cutIdx) :+ "CONV" else sorted
      val collapsed = seq0.foldLeft(List.empty[String]) {
        case (acc, s) if acc.headOption.contains(s) => acc
        case (acc, s) => s :: acc
      }.reverse
      val states = "START" :: (collapsed ++ (if (cutIdx >= 0) Nil else List("NULL")))
      states.zip(states.tail).foreach(p => trans(p) += 1L)
    }
    val withLoops = trans.toSeq.map { case ((s, d), n) => (s, d, n) } ++
      Seq(("CONV", "CONV", 1L), ("NULL", "NULL", 1L))
    def rq(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def absorb(m: Seq[(String, String, Long)]): Double = {
      val tot = m.groupBy(_._1).map { case (s, ts) => s -> ts.map(_._3).sum }
      var p = Map("START" -> 1.0)
      for (_ <- 1 to 20) p = m
        .flatMap { case (s, d, n) =>
          p.get(s).map(ps => d -> rq(ps * n.toDouble / tot(s).toDouble * 1e12)) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum / 1e12 }
      p.getOrElse("CONV", 0.0)
    }
    val cf = absorb(withLoops)
    val chans = withLoops.flatMap(t => Seq(t._1, t._2)).distinct
      .filterNot(Set("START", "CONV", "NULL")).sorted
    def removed(c: String) = withLoops.filter(_._1 != c)
      .map { case (s, d, n) => (s, if (d == c) "NULL" else d, n) }
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((s, d), ts) => (s, d, ts.map(_._3).sum) }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val effs = chans.map { c =>
      val cr = absorb(removed(c))
      (c, cr, BigDecimal(1.0 - cr / cf).setScale(12, BigDecimal.RoundingMode.HALF_UP))
    }
    val tot = effs.map(_._3).sum
    val want = effs.map { case (c, cr, e) =>
      (c, r6(cf), r6(cr), r6(e.toDouble), r6(e.toDouble / tot.toDouble)) }
    val got = Behavior.markovAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == want, s"attribution divergence: $got vs $want")
    assert(got.map(_._5).sum > 0.999 && got.map(_._5).sum < 1.001,
      "shares must sum to ~1")
    assert(got.forall(r => r._2 > 0 && r._2 <= 1.0))
  }

  test("ari1: pair algebra equals brute-force pair counting") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue, r.getDouble(2)))
    val n = cust.length
    val ranked = cust.sortBy(c => (c._3, c._1)).zipWithIndex
    // SQL ntile(4) closed form over the 1-based rank
    val base = n / 4; val rem = n % 4; val cut = (base + 1) * rem
    val q = ranked.map { case ((k, nat, _), i) =>
      val rn = i + 1
      val tile = if (cut > 0 && rn <= cut) math.ceil(rn.toDouble / (base + 1)).toInt
      else rem + math.ceil((rn - cut).toDouble / math.max(base, 1)).toInt
      (k, nat, tile)
    }
    // brute force over all pairs: same-cluster agreement counting
    var sc = 0L; var sa = 0L; var sb = 0L
    for (i <- q.indices; j <- (i + 1) until q.length) {
      val sameA = q(i)._2 == q(j)._2; val sameB = q(i)._3 == q(j)._3
      if (sameA) sa += 1
      if (sameB) sb += 1
      if (sameA && sameB) sc += 1
    }
    val r = graft.operators.Quality.adjustedRandIndex(spark, sf).head()
    assert(r.getLong(0) == n.toLong)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((sc, sa, sb)),
      s"pair sums diverge: got ${(r.getLong(1), r.getLong(2), r.getLong(3))} want ${(sc, sa, sb)}")
    val cn2 = n.toDouble * (n - 1).toDouble / 2.0
    val exp = sc.toDouble - sa.toDouble * sb.toDouble / cn2
    val den = (sa.toDouble + sb.toDouble) / 2.0 - sa.toDouble * sb.toDouble / cn2
    assert(math.abs(r.getDouble(4) - exp / den) < 1e-6)
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
