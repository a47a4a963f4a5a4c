package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {

  test("pagerank: scores positive, ordered desc, and nodes are prefixed keys") {
    val rows = Graph.pageRank(spark, sf).collect()
    assert(rows.nonEmpty)
    val prs = rows.map(_.getAs[Double]("pr"))
    assert(prs.forall(_ > 0))
    assert(prs.toSeq == prs.sortBy(-_).toSeq)
    rows.foreach { r =>
      val n = r.getAs[String]("node")
      assert(n.head == 'c' || n.head == 's', s"unexpected node id: $n")
    }
  }

  test("pagerank mass is conserved across the full vector") {
    // With symmetric edges every node has out-degree, so total rank
    // must stay ~1 after any number of iterations (up to the
    // deliberate 1e-14 contribution rounding).
    val all = Graph.pageRank(spark, sf, iterations = 2, k = Int.MaxValue)
    val total = all.agg(sum(col("pr"))).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6, s"rank mass drifted: $total")
  }

  test("pagerank favors high-degree hubs") {
    // The top node should have at least the degree of the median node:
    // a supplier trading with many customers accumulates their mass.
    val top = Graph.pageRank(spark, sf, k = 1).head.getAs[String]("node")
    val pairs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    val deg = pairs.select(col("dst").as("node"))
      .unionAll(pairs.select(col("src").as("node")))
      .groupBy("node").count()
    val topDeg = deg.filter(col("node") === top).head.getAs[Long]("count")
    val medianDeg = deg.agg(expr("percentile_approx(count, 0.5)")).head.getLong(0)
    assert(topDeg >= medianDeg, s"top node $top degree $topDeg < median $medianDeg")
  }

  test("bfs distances: histogram starts at the seed set and saturates") {
    val rows = Graph.bfsDistances(spark, sf).collect()
    assert(rows.nonEmpty)
    val dists = rows.map(_.getAs[Int]("dist")).toSeq
    assert(dists == (0 until rows.length), s"distances not contiguous: $dists")
    // seeds = nation-0 customers that actually trade
    val nSeeds = Tables.customer(spark, sf)
      .filter(col("c_nationkey") === 0)
      .join(Tables.orders(spark, sf),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    assert(rows.head.getAs[Long]("n_nodes") == nSeeds)
    // all counts positive, total bounded by graph size
    assert(rows.forall(_.getAs[Long]("n_nodes") > 0))
  }

  test("triangle stats: K4 has 4 triangles at clustering 1; a path has none") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val r = Graph.triangleStatsFrom(spark, k4).head
    assert(r.getAs[Long]("n_nodes") == 4 && r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_triangles") == 4)
    assert(r.getAs[Double]("clustering") == 1.0)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val p = Graph.triangleStatsFrom(spark, path).head
    assert(p.getAs[Long]("n_triangles") == 0L)
  }

  test("triangle stats: random graph matches a brute-force local count") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val n = 60
    val edges = (for {
      u <- 0 until n; v <- (u + 1) until n if rng.nextDouble() < 0.2
    } yield (u.toLong, v.toLong)).toSeq
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      .withDefaultValue(Set.empty[Long])
    def connected(a: Long, b: Long) = adj(math.min(a, b)).contains(math.max(a, b))
    val brute = (for {
      u <- 0L until n; v <- (u + 1) until n if connected(u, v)
      w <- (v + 1) until n if connected(u, w) && connected(v, w)
    } yield 1).size
    val r = Graph.triangleStatsFrom(spark, edges.toDF("u", "v")).head
    assert(r.getAs[Long]("n_triangles") == brute,
      s"distributed count ${r.getAs[Long]("n_triangles")} vs brute $brute")
  }

  test("sorted intersect kernel: exact on crafted arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def c(a: Seq[Long], b: Seq[Long]): Long =
      graft.functions.SortedIntersectKernel.count(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
    assert(c(Seq(1L, 3L, 5L), Seq(2L, 3L, 5L, 9L)) == 2)
    assert(c(Seq(), Seq(1L)) == 0)
    assert(c(Seq(7L), Seq(7L)) == 1)
    assert(c(Seq(1L, 2L, 3L), Seq(4L, 5L)) == 0)
  }

  test("triangle stats on the co-purchase graph: counts positive, clustering in (0,1)") {
    val r = Graph.triangleStats(spark, sf).head
    assert(r.getAs[Long]("n_triangles") > 0)
    val c = r.getAs[Double]("clustering")
    assert(c > 0.0 && c < 1.0, s"clustering out of range: $c")
  }
}
