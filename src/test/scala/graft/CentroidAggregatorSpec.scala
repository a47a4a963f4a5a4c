package graft

import org.apache.spark.sql.functions._
import graft.functions.CentroidAggregator

class CentroidAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed centroid equals the posexplode+avg formulation") {
    val typed = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(CentroidAggregator.toColumn.name("centroid"))
      .collect()
      .map { case (l, c) => l -> c.toSeq }.toMap

    val exploded = Tables.embeddings(spark, sf)
      .select(col("label"), posexplode(col("embedding")))
      .toDF("label", "dim", "x")
      .groupBy("label", "dim")
      .agg(avg(col("x").cast("double")).as("c"))
      .groupBy("label")
      .agg(sort_array(collect_list(struct(col("dim"), col("c")))).as("cs"))
      .collect()
      .map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)).toSeq).toMap

    assert(typed.keySet == exploded.keySet && typed.nonEmpty)
    typed.foreach { case (l, c) =>
      val e = exploded(l)
      assert(c.length == e.length)
      c.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("centroid of empty input is empty; of one vector is itself") {
    val one = Seq((1, Array(1.0f, 2.0f))).toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(CentroidAggregator.toColumn.name("c")).collect()
    assert(one(0)._2.toSeq == Seq(1.0, 2.0))
  }
}
