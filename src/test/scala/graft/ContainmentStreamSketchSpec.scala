package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

class ContainmentStreamSketchSpec extends SparkSpec {

  test("containment pairs: directional, in (0,1], and exact on a planted subset pair") {
    val rows = Dedup.containmentPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") != r.getAs[Long]("doc_b"))
      val c = r.getAs[Double]("containment")
      assert(c >= 0.5 && c <= 1.0 + 1e-9)
    }
    // directionality: values may differ per direction (|A| != |B|);
    // when both directions are emitted their ratio is sz_b/sz_a
    val byKey = rows.map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("containment")).toMap
    assert(byKey.keySet.nonEmpty)
  }

  test("containment matches a brute-force recompute on emitted pairs") {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"),
        Dedup.shinglesFromWords(TextAnalysis.words(col("text")), 5).as("s"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("s").toSet).toMap
    Dedup.containmentPairs(spark, sf).collect().foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val expected = (sets(a) & sets(b)).size.toDouble / sets(a).size
      assert(math.abs(r.getAs[Double]("containment") - expected) < 1e-5,
        s"pair ($a,$b): got ${r.getAs[Double]("containment")}, want $expected")
    }
  }

  test("streaming hourly HLL: estimates track exact counts within sketch error") {
    val rows = graft.streaming.StreamingSketch.streamingHourlyHll(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_hll")
      val exact = r.getAs[Long]("n_exact")
      assert(exact > 0)
      // m=64 -> ~13% stderr; tiny per-hour counts need an absolute floor
      assert(math.abs(est - exact) < math.max(3.0, 0.45 * exact),
        s"hour ${r.getString(0)}: est $est vs exact $exact")
      assert(r.getAs[Long]("v_empty") >= 0 && r.getAs[Long]("v_empty") <= 64)
    }
  }

  test("streaming hourly HLL covers every hour present in the batch table") {
    val hours = Tables.events(spark, sf)
      .select(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("h")).distinct().count()
    val got = graft.streaming.StreamingSketch.streamingHourlyHll(spark, sf).count()
    assert(got == hours, s"streamed $got hours, batch has $hours")
  }
}
