package graft

import org.apache.spark.sql.functions._
import graft.functions.TripleExpandKernel
import graft.operators.Relational

/** Pins the round-15 fi2 triple-assembly kernel
  * ([[graft.functions.TripleExpandExpr]]) to the naive O(m²)
  * enumeration it replaced, and the gate path end to end on a planted
  * basket corpus.
  */
class TripleExpandSpec extends SparkSpec {

  private def naive(pairs: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
    pairs.flatMap { case (a, b) =>
      pairs.filter(_._1 == b).map { case (_, c) => (a, b, c) }
    }

  test("kernel matches the naive nested-loop expansion, order included") {
    val cases = Seq(
      Seq.empty[(Long, Long)],
      Seq((1L, 2L)),
      Seq((1L, 2L), (2L, 3L)),
      // chain + fan-out: (1,2) matches (2,3),(2,4); (2,3) matches (3,4)
      Seq((1L, 2L), (2L, 3L), (2L, 4L), (3L, 4L)),
      // duplicate first components at the array head and tail
      Seq((1L, 5L), (1L, 6L), (5L, 6L), (5L, 7L), (6L, 7L)),
      // no matches at all
      Seq((1L, 9L), (2L, 9L), (3L, 9L)))
    cases.foreach { fp =>
      val sorted = fp.sorted
      assert(TripleExpandKernel.expandPairs(sorted) == naive(sorted),
        s"mismatch for $sorted")
    }
  }

  test("kernel matches naive on a random lex-sorted pair set") {
    val rnd = new scala.util.Random(15)
    (1 to 20).foreach { _ =>
      val fp = Seq.fill(30)((rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
        .filter(p => p._1 < p._2).distinct.sorted
      assert(TripleExpandKernel.expandPairs(fp) == naive(fp))
    }
  }

  test("fi2 gate path over a planted corpus equals brute-force triples") {
    import spark.implicits._
    // baskets: two triangles sharing an edge + noise singles.
    val items = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 30L),
      (3L, 10L), (3L, 20L), (3L, 40L),
      (4L, 10L), (4L, 20L), (4L, 40L),
      (5L, 50L)).toDF("l_orderkey", "l_partkey")
    val got = Relational.frequentItemTriplesFrom(spark, items, minSupport = 2,
        basketCap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute force: per basket all sorted triples, count, filter >= 2
    val baskets = Map(
      1L -> Seq(10L, 20L, 30L), 2L -> Seq(10L, 20L, 30L),
      3L -> Seq(10L, 20L, 40L), 4L -> Seq(10L, 20L, 40L), 5L -> Seq(50L))
    val want = baskets.values.toSeq
      .flatMap(ps => ps.combinations(3).map(c => (c(0), c(1), c(2))))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter(_._2 >= 2)
      .map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy { case (a, b, c, n) => (-n, a, b, c) }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
  }
}
