package graft

import org.apache.spark.sql.functions._
import graft.operators.{Behavior, Diagnostics, Learn}

/** Round-13: the engine-proof restatements of the four driver-red
  * gates (att4/bt1/dsk1/gb1 → sufficient-statistics frames) and the
  * temporary diagnostic battery that bisects the driver-side oracle
  * divergence (SURVEY §13).
  *
  * The restated gate outputs must stay CONSISTENT with the fitted
  * models they replaced — the frames are the models' sufficient
  * statistics, so every marginal the old outputs exposed must be
  * recoverable from the new ones.
  */
class DiagnosticsSpec extends SparkSpec {

  test("registry: every diagnostic gate has an oracle, and the bench " +
    "exclusion predicate covers exactly the diagnostic keys") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    val diag = qs.filter(Diagnostics.isDiagnostic)
    // All 32 diagnostics registered, each with an oracle.
    assert(diag.size == 32, s"expected 32 diagnostic gates, got ${diag.size}")
    diag.foreach(k => assert(os.contains(k), s"$k has no oracle"))
    // Probe maps stay key-aligned.
    assert(Diagnostics.probes.keySet == Diagnostics.probeSql.keySet)
    // The predicate must NOT swallow the real xl* gates.
    assert(!Diagnostics.isDiagnostic("xl1_margin_mining"))
    assert(!Diagnostics.isDiagnostic("xl2_margin_mining_ann"))
    // The four restated gates are NOT diagnostics (they stay benched).
    Seq("att4_shapley", "bt1_bradley_terry", "dsk1_dawid_skene",
      "gb1_adaboost_stumps").foreach(k => assert(!Diagnostics.isDiagnostic(k)))
  }

  test("bt1 restated: duel counts are the BT sufficient statistic — " +
    "the fitted frame's wins/comparisons margins are recoverable") {
    val duels = Learn.duelCounts(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val fitted = Learn.bradleyTerry(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val winsOf = duels.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val compOf = fitted.map(_._1).map { i =>
      i -> duels.collect {
        case (w, l, n) if w == i || l == i => n
      }.sum
    }.toMap
    assert(fitted.nonEmpty)
    fitted.foreach { case (item, wins, comparisons) =>
      assert(wins == winsOf.getOrElse(item, 0L), s"wins margin for $item")
      assert(comparisons == compOf(item), s"comparisons margin for $item")
    }
    // Sorted, strictly keyed output.
    assert(duels.map(t => (t._1, t._2)).distinct.length == duels.length)
  }

  test("dsk1 restated: vote-pattern counts cover the corpus and the " +
    "majority flag is the pattern majority") {
    val pats = Learn.votePatternCounts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(pats.map(_._4).sum == nDocs)
    pats.foreach { case (v1, v2, v3, _, maj) =>
      assert(maj == (if (v1 + v2 + v3 >= 2) 1L else 0L))
    }
    assert(pats.map(t => (t._1, t._2, t._3)).distinct.length == pats.length)
  }

  test("gb1 restated: the trace's stump identities equal the fitted " +
    "ensemble's, and raw error counts match a brute stump evaluation") {
    val trace = Learn.adaboostStumpTrace(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val fitted = Learn.adaboostStumps(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 <= 3) // drop the ensemble row
    assert(trace.map(t => (t._1, t._2, t._3, t._4)).sameElements(fitted))
    // Brute per-stump raw error over lineitem.
    val li = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_tax") * 100).cast("long"),
        when(col("l_returnflag") === "R", 1L).otherwise(-1L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    trace.foreach { case (_, f, t, pol, errRows, totalRows) =>
      assert(totalRows == li.length)
      val brute = li.count { g =>
        val v = if (f == 1L) g._1 else if (f == 2L) g._2 else g._3
        pol * (if (v <= t) 1L else -1L) != g._4
      }
      assert(errRows == brute, s"raw error for stump ($f,$t,$pol)")
    }
  }

  test("att4 restated: the cohort lattice is zero-filled, totals match " +
    "the user population, and the old exposure margins are recoverable") {
    val coh = Behavior.exposureCohorts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(coh.map(_._1).sameElements(0L until 16L))
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(coh.map(_._2).sum == users)
    // The fitted frame's exposure margins re-derive from the lattice.
    val phis = Behavior.shapleyAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val bits = Map("click" -> 1L, "error" -> 2L, "signup" -> 4L, "view" -> 8L)
    phis.foreach { case (ch, uExp, cExp) =>
      val b = bits(ch)
      val sel = coh.filter(t => (t._1 & b) != 0L)
      assert(uExp == sel.map(_._2).sum, s"users_exposed margin for $ch")
      assert(cExp == sel.map(_._3).sum, s"conversions_exposed margin for $ch")
    }
    // vq diagnostic: rhu of the lattice rates.
    val vq = Behavior.exposureVq(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    coh.foreach { case (m, u, c) =>
      val expect =
        if (u > 0) ((2 * BigInt(c) * 1000000000L + u) / (2 * BigInt(u))).toLong
        else 0L
      assert(vq(m) == expect, s"vq($m)")
    }
  }

  test("rhu enforces its non-negative domain (r12 advice)") {
    intercept[IllegalArgumentException] {
      graft.operators.Learn.rhu(BigInt(-1), BigInt(2))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Learn.rhu(BigInt(1), BigInt(0))
    }
    assert(graft.operators.Learn.rhu(BigInt(1), BigInt(8)) == BigInt(0))
    assert(graft.operators.Learn.rhu(BigInt(4), BigInt(8)) == BigInt(1))
  }
}
