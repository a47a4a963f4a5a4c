package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Ranks

/** Property coverage for the exact-distributed-ranking primitive that
  * replaces single-partition global windows (w7/w8/seg1/gini1): the
  * range-partitioned rank must equal the global window's rank on
  * arbitrary frames (duplicates included — the order is made total
  * with a unique tiebreak), and the closed-form ntile must match
  * Spark's own ntile for every (n, k) shape.
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("withGlobalRowNumber equals the global window rank on random frames") {
    val rnd = new scala.util.Random(41)
    // duplicate-heavy values force tie handling through the tiebreak
    val rows = (1L to 5000L).map(id => (id, rnd.nextInt(50).toDouble))
    val df = rows.toDF("id", "v")
    val order = Seq(col("v").desc, col("id").asc)
    val (ranked, n) = Ranks.withGlobalRowNumber(df, order, np = 7, "rn")
    assert(n == 5000L)
    val expected = df.withColumn("exp_rn",
      row_number().over(Window.orderBy(order: _*)).cast("long"))
    val diff = ranked.join(expected, "id")
      .filter(col("rn") =!= col("exp_rn")).count()
    assert(diff == 0L, s"$diff ranks diverge from the global window")
    ranked.unpersist()
  }

  test("ntileOfRank matches Spark's ntile for every (n, k) shape") {
    for (n <- Seq(1, 2, 3, 7, 10, 23, 40); k <- Seq(1, 2, 3, 4, 7, 10)) {
      val df = (1 to n).map(i => Tuple1(i.toLong)).toSeq.toDF("rn")
      val got = df.select(col("rn"),
          Ranks.ntileOfRank(col("rn"), n.toLong, k).as("b"))
        .orderBy(col("rn")).as[(Long, Int)].collect().map(_._2).toSeq
      val exp = df.select(col("rn"),
          ntile(k).over(Window.orderBy(col("rn"))).as("b"))
        .orderBy(col("rn")).as[(Long, Int)].collect().map(_._2).toSeq
      assert(got == exp, s"ntile mismatch at n=$n k=$k: $got vs $exp")
    }
  }

  test("rank is stable across partition counts (np does not leak into results)") {
    val df = (1L to 999L).map(id => (id, (id * 7919L) % 97L)).toDF("id", "v")
    val order = Seq(col("v").asc, col("id").asc)
    def ranksAt(np: Int): Map[Long, Long] = {
      val (r, _) = Ranks.withGlobalRowNumber(df, order, np, "rn")
      val out = r.select(col("id").as[Long], col("rn").as[Long]).collect().toMap
      r.unpersist(); out
    }
    assert(ranksAt(1) == ranksAt(8))
    assert(ranksAt(8) == ranksAt(33))
  }
}
