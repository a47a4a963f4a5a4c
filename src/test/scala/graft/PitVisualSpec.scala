package graft

import org.apache.spark.sql.functions._
import graft.operators.{Behavior, Multimodal}

class PitVisualSpec extends SparkSpec {

  test("point-in-time features: no leakage — clicks at/after the label never count") {
    val feats = Behavior.pointInTimeFeatures(spark, sf).collect()
    assert(feats.nonEmpty)
    // recompute one purchase's feature driver-side from raw events
    val withClicks = feats.filter(_.getAs[Long]("n_clicks_7d") > 0)
    assert(withClicks.nonEmpty, "no purchase has prior clicks — band too narrow")
    val probe = withClicks.head
    val eid = probe.getAs[Long]("event_id")
    val e = Tables.events(spark, sf).select(col("event_id"), col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("us")).collect()
    val p = e.find(_.getAs[Long]("event_id") == eid).get
    val expected = e.count(r => r.getAs[String]("event_type") == "click" &&
      r.getAs[Long]("user_id") == p.getAs[Long]("user_id") &&
      r.getAs[Long]("us") >= p.getAs[Long]("us") - 604800000000L &&
      r.getAs[Long]("us") < p.getAs[Long]("us"))
    assert(probe.getAs[Long]("n_clicks_7d") == expected)
  }

  test("point-in-time features cover every filtered purchase exactly once") {
    val n = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase" && col("user_id") < 30).count()
    val feats = Behavior.pointInTimeFeatures(spark, sf).collect()
    assert(feats.length == n)
    assert(feats.map(_.getAs[Long]("event_id")).distinct.length == feats.length)
  }

  test("visual dup groups: every group has >1 image and consistent doc bounds") {
    val rows = Multimodal.visualDupGroups(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_images") > 1)
      assert(r.getAs[Long]("first_doc") < r.getAs[Long]("last_doc"))
      Seq("qr", "qg", "qb").foreach { c =>
        val q = r.getAs[Int](c); assert(q >= 0 && q <= 7, s"$c=$q out of range")
      }
    }
  }

  test("visual dup groups signatures match per-image decode output") {
    val groups = Multimodal.visualDupGroups(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getAs[Long]("n_images")).toMap
    val perImage = Multimodal.imageDecodeStats(spark, sf).collect()
      .groupBy(r => (
        math.floor(r.getAs[Double]("mean_r") / 32).toInt,
        math.floor(r.getAs[Double]("mean_g") / 32).toInt,
        math.floor(r.getAs[Double]("mean_b") / 32).toInt))
      .view.mapValues(_.length.toLong).toMap
    groups.foreach { case (sig, n) =>
      assert(perImage.getOrElse(sig, 0L) == n, s"group $sig count mismatch")
    }
  }
}
