package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph, TextAnalysis}

/** Edge-case hardening for the round-5 operators: degenerate
  * parameters must produce principled results, not exceptions or
  * silent garbage.
  */
class RoundFiveEdgeSpec extends SparkSpec {

  test("pagerank with a single iteration still conserves rank mass") {
    val all = Graph.pageRank(spark, sf, iterations = 1, k = Int.MaxValue)
    val total = all.agg(sum(col("pr"))).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6, s"mass after 1 iter: $total")
  }

  test("containment above 1.0 threshold yields no pairs") {
    assert(Dedup.containmentPairs(spark, sf, threshold = 1.01).count() == 0)
  }

  test("containment at threshold 1.0 returns only full-subset pairs") {
    val rows = Dedup.containmentPairs(spark, sf, threshold = 1.0).collect()
    rows.foreach(r => assert(r.getAs[Double]("containment") == 1.0))
  }

  test("weighted sample with huge k returns the whole eligible corpus") {
    val n = Tables.documents(spark, sf).filter(col("n_chars") > 0).count()
    assert(TextAnalysis.weightedSample(spark, sf, k = Int.MaxValue).count() == n)
  }

  test("bpe with one step emits exactly one merge") {
    val rows = TextAnalysis.bpeTrain(spark, sf, steps = 1).collect()
    assert(rows.length == 1 && rows.head.getAs[Int]("step") == 1)
  }

  test("fixed-size sample larger than corpus returns every doc") {
    val n = Tables.documents(spark, sf).count()
    assert(TextAnalysis.fixedSizeSample(spark, sf, k = Int.MaxValue).count() == n)
  }

  test("growth curve: monotone cumulative counts reaching total users") {
    val rows = graft.operators.Behavior.userGrowthCurve(spark, sf, Int.MaxValue).collect()
    assert(rows.nonEmpty)
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.toSeq == cums.sorted.toSeq)
    assert(cums.last == Tables.events(spark, sf).select("user_id").distinct().count())
    assert(cums.last == rows.map(_.getAs[Long]("n_new_users")).sum)
  }

  test("referential integrity: all five star edges pass on the clean corpus") {
    val rows = graft.operators.Quality.referentialIntegrity(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") == 0 && r.getAs[Boolean]("passed"), s"$r")
    }
  }

  test("ngram diversity on a single-doc frame stays consistent") {
    // the operator API takes a dir; restrict via a temp view is not
    // supported — instead check the global invariant n_distinct <= n_total
    // survives at the smallest SF (degenerate corpora covered by
    // construction in the sf0.001 fixtures)
    graft.operators.TextAnalysis.ngramDiversity(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_total"))
    }
  }
}
