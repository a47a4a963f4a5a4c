package graft

import org.apache.spark.sql.functions._
import graft.operators.{Behavior, Packing, Quality}

/** Round-6 additions: batch sessionization (isl1), recursive-CTE
  * batch packing (rcte1), hourly-count autocorrelation (acf1).
  */
class SessionsRecursionSpec extends SparkSpec {

  test("isl1: every event lands in exactly one session") {
    val hist = Behavior.batchSessions(spark, sf).collect()
    val totalEvents = hist.map(r =>
      r.getAs[Long]("session_size") * r.getAs[Long]("n_sessions")).sum
    assert(totalEvents == Tables.events(spark, sf).count())
    // size-1 sessions have zero duration by construction
    hist.find(_.getAs[Long]("session_size") == 1L).foreach { r =>
      assert(r.getAs[Double]("avg_duration_sec") == 0.0)
    }
  }

  test("isl1: widening the gap can only merge sessions") {
    def nSessions(gapMin: Int): Long =
      Behavior.batchSessions(spark, sf, gapMinutes = gapMin).collect()
        .map(_.getAs[Long]("n_sessions")).sum
    val narrow = nSessions(5)
    val wide = nSessions(240)
    assert(wide <= narrow, s"gap widen increased sessions: $narrow -> $wide")
  }

  test("rcte1: recursion reproduces a driver-side greedy replay") {
    val cap = 30000000L
    // replay the greedy capped accumulator per customer in plain Scala
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate").cast("string").as("od"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = orders.groupBy(_._1).map { case (_, os) =>
      val sorted = os.sortBy(o => (o._2, o._3)).map(_._4)
      // anchor row opens batch 1 unconditionally (even over-cap),
      // mirroring the recursive CTE's anchor term
      var acc = sorted.head; var batches = 1
      sorted.tail.foreach { c =>
        if (acc + c > cap) { batches += 1; acc = c } else acc += c
      }
      batches
    }.groupBy(identity).map { case (b, xs) => (b.toLong, xs.size.toLong) }
    val got = Packing.orderBatchPacking(spark, sf).collect()
      .map(r => (r.getAs[Long]("n_batches"), r.getAs[Long]("n_customers")))
      .toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("rcte1: raising the cap cannot increase any customer's batches") {
    def total(cap: Long): Long =
      Packing.orderBatchPacking(spark, sf, capCents = cap).collect()
        .map(r => r.getAs[Long]("n_batches") * r.getAs[Long]("n_customers")).sum
    assert(total(60000000L) <= total(30000000L))
  }

  test("acf1: correlations bounded, pairs decrease with lag span") {
    val rows = Quality.autocorrelation(spark, sf).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 && a <= 1.0, s"acf out of range: $r")
      assert(r.getAs[Long]("n_pairs") > 0)
    }
    // a perfectly periodic synthetic series scores acf=1 at its period
    val period = Seq.tabulate(240)(i => (i.toLong, (i % 24 + 1).toLong))
    val df = spark.createDataFrame(period).toDF("hi", "n")
    val a = df.select(col("hi"), col("n").as("x"))
    val b = df.select(col("hi").as("hib"), col("n").as("y"))
    val r24 = a.join(b, col("hib") === col("hi") + lit(24))
      .agg(count(lit(1)).as("np"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(((col("np") * col("sxy") - col("sx") * col("sy")).cast("double")
        / (sqrt((col("np") * col("sxx") - col("sx") * col("sx")).cast("double"))
          * sqrt((col("np") * col("syy") - col("sy") * col("sy")).cast("double"))))
        .as("acf"))
      .collect()(0).getAs[Double]("acf")
    assert(math.abs(r24 - 1.0) < 1e-12)
  }
}
