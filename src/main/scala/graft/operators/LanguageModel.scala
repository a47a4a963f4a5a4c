package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis.words

/** Statistical language-model scoring for corpus quality filtering.
  *
  * The CCNet/KenLM pattern every large-scale training-data pipeline
  * runs: train an n-gram language model over the corpus, score each
  * document's perplexity under it, and gate/bucket documents by that
  * score. The reference has no LM anything (its analytics stop at
  * min/max over quotes, reference: dagster_repository/resources.py:58-67);
  * this is a north-star LLM-pipeline operator over the `documents`
  * table.
  *
  * Scale shape: the model is two count tables (bigram and history
  * counts) built by map-side-combinable aggregations keyed on the
  * token(s); scoring joins the token stream back to the model on the
  * same keys, so at 100 TB both the training shuffle and the scoring
  * join partition by bigram/history hash with no hot driver path. The
  * only driver transfer is the scalar vocabulary size. AQE upgrades
  * the model join to broadcast automatically when the vocabulary is
  * small.
  *
  * Determinism (for the cross-engine gate): probabilities are ratios
  * of exact integer counts — (c12+1)/(c1+V) add-one smoothing — so the
  * double division is bit-identical in Spark and DuckDB; per-token
  * negative log-likelihoods are rounded to 8 decimals and summed as
  * DECIMAL(20,8) (exact, order-independent) before the final
  * double-precision average, so libm last-ulp drift cannot leak into
  * the hash compare.
  */
object LanguageModel {

  /** Per-document bigram cross-entropy and perplexity (query lm1):
    * add-one-smoothed bigram LM trained on the corpus itself, top-k
    * highest-perplexity documents (the "weird text" a quality filter
    * would drop first).
    */
  def bigramPerplexity(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val ws = docs.select(col("doc_id"), words(col("text")).as("ws"))

    // Bigram occurrence stream: (doc_id, w1, w2) per adjacent pair.
    val bigrams = ws
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("ws")) - lit(2)),
          i => struct(
            element_at(col("ws"), i + lit(1)).as("w1"),
            element_at(col("ws"), i + lit(2)).as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))

    // Model: bigram counts and history counts (counts of w1 as a
    // bigram head — consistent with conditioning on "w1 followed by
    // anything"). Both are one shuffle keyed on the token(s).
    val c2 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))

    // Vocabulary size: one scalar to the driver (control plane only).
    val v = ws.select(explode(col("ws")).as("w"))
      .agg(count_distinct(col("w"))).head.getLong(0)

    // Score the stream under the model: add-one smoothing keeps every
    // observed bigram strictly positive-probability.
    val scored = bigrams
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .select(col("doc_id"),
        // integer-exact ratio -> identical double in both engines
        ((col("c12") + lit(1)).cast("double") /
          (col("c1") + lit(v)).cast("double")).as("p"))
      .select(col("doc_id"),
        // round-then-DECIMAL makes the per-doc sum exact and
        // order-independent across engines
        round(-log(col("p")), 8).cast("decimal(20,8)").as("nll"))

    scored.groupBy(col("doc_id"))
      .agg(sum(col("nll")).as("s"), count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("s").cast("double") / col("n_bigrams"), 6).as("avg_nll"),
        round(exp(col("s").cast("double") / col("n_bigrams")), 6).as("ppl"))
      .orderBy(desc("ppl"), asc("doc_id"))
      .limit(k)
  }
}
