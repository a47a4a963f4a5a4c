package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps

class VectorNormsSpec extends SparkSpec {

  test("matryoshka norms: head mass bounded by full mass, ratio consistent") {
    val rows = VectorOps.matryoshkaNorms(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nf = r.getAs[Double]("norm_full")
      val nh = r.getAs[Double]("norm_head")
      val cos = r.getAs[Double]("cos_trunc")
      assert(nf > 0 && nh >= 0 && nh <= nf + 1e-9)
      assert(cos >= 0 && cos <= 1.0 + 1e-9)
      assert(math.abs(cos - nh / nf) < 1e-5)
    }
  }

  test("matryoshka head norm matches a driver-side recompute") {
    val vecs = Tables.embeddings(spark, sf).filter(col("vec_id") < 50)
      .collect().map { r =>
        r.getAs[Long]("vec_id") ->
          r.getAs[scala.collection.Seq[Float]]("embedding")
      }.toMap
    VectorOps.matryoshkaNorms(spark, sf).collect().foreach { r =>
      val e = vecs(r.getAs[Long]("vec_id"))
      val nh = math.sqrt(e.take(16).map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(r.getAs[Double]("norm_head") - nh) < 1e-5)
    }
  }
}
