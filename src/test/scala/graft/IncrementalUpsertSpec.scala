package graft

import org.apache.spark.sql.functions._
import graft.streaming.IncrementalUpsert

class IncrementalUpsertSpec extends SparkSpec {

  test("st11: three-batch foreachBatch merge equals the one-shot aggregate") {
    val got = IncrementalUpsert.incrementalUpsertGate(spark, sf).collect()
    val want = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(30,6)")).cast("double"), 6)
          .as("sum_value"))
      .orderBy(col("event_type"))
      .collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[String]("event_type") == w.getAs[String]("event_type"))
      assert(g.getAs[Long]("n") == w.getAs[Long]("n"))
      assert(g.getAs[Double]("sum_value") == w.getAs[Double]("sum_value"),
        s"decimal merge drifted for ${g.getAs[String]("event_type")}")
    }
    // staging must be cleaned eagerly
    val shm = new java.io.File("/dev/shm")
    val residue = Option(shm.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("graft_st11_"))
    assert(residue.isEmpty, s"staging residue: ${residue.mkString(",")}")
  }
}
