package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class AsofJoinPlanSpec extends SparkSpec {

  test("native as-of join plans AsofJoinExec with one exchange+sort per side") {
    val df = Relational.asofNativePurchaseClick(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec missing from plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges")
    assert("\\bSort\\b".r.findAllIn(plan).length >= 2,
      "EnsureRequirements should insert a sort per side")
  }

  test("native as-of join result equals the window-trick formulation") {
    val native = Relational.asofNativePurchaseClick(spark, sf).collect()
    val viaWindow = Relational.asofPurchaseClick(spark, sf).collect()
    assert(native.length == viaWindow.length)
    val n = native.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1)
    val w = viaWindow.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1)
    assert(n.toSeq == w.toSeq)
  }

  test("native forward as-of equals the window-trick aj2 formulation") {
    val native = Relational.asofNativeNextPurchase(spark, sf).collect()
    val viaWindow = Relational.asofNextPurchase(spark, sf).collect()
    assert(native.length == viaWindow.length && native.nonEmpty)
    def norm(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1).toSeq
    assert(norm(native) == norm(viaWindow))
  }

  test("as-of join: NULL keys match nothing (SQL equi-join semantics)") {
    import spark.implicits._
    val left = Seq((Option(1L), 10L, "l1"), (Option.empty[Long], 10L, "l2"),
        (Option(2L), 10L, "l3"))
      .toDF("k", "t", "lv")
    val right = Seq((Option(1L), 5L, 100L, "a"),
        (Option.empty[Long], 5L, 101L, "x"), (Option(2L), 20L, 102L, "b"))
      .toDF("rk", "rt", "tie", "rv")
    val out = graft.plans.AsofJoinOps.asofBackward(left, right,
      Seq("k"), Seq("rk"), "t", "rt", "tie").collect()
    assert(out.length == 3, "LEFT OUTER: every left row emits exactly once")
    val byLv = out.map(r => r.getAs[String]("lv") ->
      Option(r.getAs[String]("rv"))).toMap
    assert(byLv("l1") == Some("a"))
    assert(byLv("l2").isEmpty,
      "null-keyed left row must not match the null-keyed right row")
    assert(byLv("l3").isEmpty, "no right row at-or-before t=10 for key 2")
  }

  test("as-of join rejects pairwise-misaligned key types") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq(("1", 5L, 1L)).toDF("rk", "rt", "tie")
    val ex = intercept[Throwable] {
      graft.plans.AsofJoinOps.asofBackward(left, right,
        Seq("k"), Seq("rk"), "t", "rt", "tie").collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("key types must align"), s"unexpected error: $msgs")
  }

  test("native as-of join: unmatched purchases yield null click ids") {
    val rows = Relational.asofNativePurchaseClick(spark, sf).collect()
    // every matched click must precede-or-equal its purchase in time
    val e = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(!_.isNullAt(2)).foreach { r =>
      assert(e(r.getLong(2)) <= e(r.getLong(0)),
        s"click ${r.getLong(2)} after purchase ${r.getLong(0)}")
    }
  }
}
