package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Quality}

class IngestDedupQualitySpec extends SparkSpec {

  test("incremental ingest dedup returns only delta docs, subset-closed") {
    val kept = Dedup.incrementalIngestDedup(spark, sf).collect().map(_.getLong(0))
    assert(kept.forall(_ % 10 == 0), "survivors must come from the delta split")
    val deltaN = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).count()
    assert(kept.length <= deltaN)
    assert(kept.nonEmpty)
  }

  test("incremental ingest dedup drops exactly the prefix-collided docs") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(substring(col("text"), 1, 100)).as("h"))
    val baseH = docs.filter(col("doc_id") % 10 =!= 0)
      .select("h").distinct().collect().map(_.getString(0)).toSet
    val expected = docs.filter(col("doc_id") % 10 === 0).collect()
      .filter(r => !baseH.contains(r.getString(1))).map(_.getLong(0)).sorted
    val got = Dedup.incrementalIngestDedup(spark, sf).collect().map(_.getLong(0))
    assert(got.toSeq == expected.toSeq)
  }

  test("winsorized stats: band ordering and clamped range") {
    val r = Quality.winsorizedStats(spark, sf).head
    val (p01, p99) = (r.getAs[Double]("p01"), r.getAs[Double]("p99"))
    val (mn, mx) = (r.getAs[Double]("min_wins"), r.getAs[Double]("max_wins"))
    val avg = r.getAs[Double]("avg_wins")
    assert(p01 < p99)
    assert(math.abs(mn - p01) < 1e-6 && math.abs(mx - p99) < 1e-6,
      "clamped min/max must hit the winsor band edges")
    assert(avg > mn && avg < mx)
    assert(r.getAs[Long]("n") ==
      Tables.lineitem(spark, sf).count())
  }

  test("winsorized mean is pulled toward the center vs the raw mean") {
    val raw = Tables.lineitem(spark, sf)
      .agg(avg(col("l_extendedprice"))).head.getDouble(0)
    val wins = Quality.winsorizedStats(spark, sf).head.getAs[Double]("avg_wins")
    // winsorizing a right-skewed price distribution lowers the mean
    assert(math.abs(wins - raw) / raw < 0.05,
      s"winsorized mean $wins wildly off raw mean $raw")
  }
}
