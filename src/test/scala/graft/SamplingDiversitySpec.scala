package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class SamplingDiversitySpec extends SparkSpec {

  test("weighted sample: keys ordered desc, negative, and reproducible") {
    val a = TextAnalysis.weightedSample(spark, sf).collect()
    val b = TextAnalysis.weightedSample(spark, sf).collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq, "weighted sample not deterministic")
    val keys = a.map(_.getAs[Double]("wkey"))
    assert(keys.toSeq == keys.sortBy(-_).toSeq)
    assert(keys.forall(k => k < 0), "ln(u)/w must be negative for u<1")
  }

  test("weighted sample favors heavier documents") {
    // Mean n_chars of the sample should exceed the corpus mean:
    // inclusion odds are proportional to n_chars.
    val sampleMean = TextAnalysis.weightedSample(spark, sf, 20)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("ngram diversity: three levels, ratios in (0,1], totals decrease with n") {
    val rows = TextAnalysis.ngramDiversity(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("n")).toSeq == Seq(1, 2, 3))
    val totals = rows.map(_.getAs[Long]("n_total"))
    assert(totals(0) > totals(1) && totals(1) > totals(2),
      "n-gram totals must decrease with n")
    rows.foreach { r =>
      val ratio = r.getAs[Double]("distinct_ratio")
      assert(ratio > 0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_total"))
    }
    // higher-order grams are strictly more diverse on natural-ish text
    val ratios = rows.map(_.getAs[Double]("distinct_ratio"))
    assert(ratios(0) < ratios(2), "trigram diversity should exceed unigram")
  }
}
