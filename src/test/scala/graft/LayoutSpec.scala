package graft

import org.apache.spark.sql.functions._

/** Z-order layout (z1): the point of the Morton key is that cutting
  * the zval-sorted table into files bounds the min/max footer range of
  * EVERY clustered dimension, not just the leading sort key — which is
  * what lets parquet stats prune files for predicates on either column.
  */
class LayoutSpec extends SparkSpec {

  test("z-order chunks bound both dims; single-column sort leaves one dim full-span") {
    val rows = graft.operators.Ingest.zorderLayout(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val nChunks = 16
    def chunkRanges(sorted: Array[(Long, Long)]): (Double, Double) = {
      val per = math.max(1, math.ceil(sorted.length / nChunks.toDouble).toInt)
      val chunks = sorted.grouped(per).toArray
      def avgRange(f: ((Long, Long)) => Long): Double =
        chunks.map { c =>
          (c.map(f).max - c.map(f).min + 1).toDouble / 65536.0
        }.sum / chunks.length
      (avgRange(_._1), avgRange(_._2))
    }
    // zval order: both dims bounded per chunk
    val zsorted = rows.sortBy(_._3).map(t => (t._1, t._2))
    val (zx, zy) = chunkRanges(zsorted)
    assert(zx < 0.6 && zy < 0.6, s"z-order avg ranges cx=$zx cy=$zy")
    // custkey order: custkey tight, price ~full-span in every chunk
    val csorted = rows.sortBy(_._1).map(t => (t._1, t._2))
    val (cx, cy) = chunkRanges(csorted)
    assert(cx < 0.2, s"custkey-sorted custkey range $cx")
    assert(cy > 0.8, s"custkey-sorted price range should be near full-span, got $cy")
    // and the z-order price bound is a real improvement over that
    assert(zy < cy / 2, s"z-order price range $zy vs custkey-sorted $cy")
  }

  test("zval interleave is invertible on the cell grid (no key collisions across cells)") {
    val rows = graft.operators.Ingest.zorderLayout(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (cx, cy, z) =>
      var x = 0L; var y = 0L
      (0 until 16).foreach { i =>
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(x == cx && y == cy, s"zval $z did not invert to ($cx,$cy)")
    }
  }

  test("enc1: run counts match a literal sequential scan on sf lineitem") {
    val got = graft.operators.Ingest.rleRunsGate(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("string"), col("l_returnflag"),
        col("l_linestatus"), col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    def runs[T](vals: Seq[T]): Long =
      1L + vals.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
    def expect(sorted: Seq[(String, String, String, Long, Long, Long)]) = Seq(
      ("l_returnflag", runs(sorted.map(_._2))),
      ("l_linestatus", runs(sorted.map(_._3))),
      ("l_suppkey", runs(sorted.map(_._4))),
      ("l_shipdate", runs(sorted.map(_._1))))
    val byDate = rows.sortBy(t => (t._1, t._5, t._6)).toSeq
    val byKey = rows.sortBy(t => (t._5, t._6)).toSeq
    val want = (expect(byDate).map { case (c, n) => ("ship_date", c, n) } ++
      expect(byKey).map { case (c, n) => ("order_key", c, n) }).toSet
    assert(got === want)
  }
}
