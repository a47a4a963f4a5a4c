package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quality, Relational, TextAnalysis}

class MixDriftReportSpec extends SparkSpec {

  test("temperature mixture: weights normalize and compress shares toward uniform") {
    val rows = TextAnalysis.temperatureMixture(spark, sf).collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum to $wsum")
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      val weight = r.getAs[Double]("weight")
      // T=2 pulls every source toward uniform: tail sources gain,
      // head sources shed
      val uniform = 1.0 / rows.length
      if (share < uniform) assert(weight > share, s"tail source lost mass: $r")
      if (share > uniform) assert(weight < share, s"head source gained mass: $r")
    }
  }

  test("psi drift: same-distribution halves stay under the 0.1 threshold") {
    val rows = Quality.psiDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val psi = rows.map(_.getAs[Double]("psi_term")).sum
    assert(psi >= 0 && psi < 0.1, s"parity split PSI unexpectedly high: $psi")
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("p") - r.getAs[Double]("q")) < 0.2)
    }
  }

  test("mad outliers: robust stats bounded and flag a minority of rows") {
    val rows = Quality.madOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (med, mad) = (r.getAs[Double]("med"), r.getAs[Double]("mad"))
      val (n, out) = (r.getAs[Long]("n"), r.getAs[Long]("n_outliers"))
      assert(mad >= 0 && med > 0)
      assert(out >= 0 && out < n / 4,
        s"MAD flagged >25% of ${r.getString(0)} as outliers — not robust")
    }
  }

  test("q10 returned items: revenue ranks desc and only quarter orders count") {
    val rows = Relational.returnedItemReport(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.toSeq == revs.sortBy(-_).toSeq)
    assert(revs.forall(_ > 0))
  }
}
