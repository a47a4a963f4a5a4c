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
  def bigramPerplexity(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    bigramScoresAll(spark, dir)
      .orderBy(desc("ppl"), asc("doc_id"))
      .limit(k)

  /** Per-document scores WITHOUT the top-k cut — the form downstream
    * curation composes with (see [[Curation.curationV2]]).
    */
  def bigramScoresAll(spark: SparkSession, dir: String): DataFrame = {
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
  }

  /** Gated lm2: TRIGRAM stupid-backoff scoring of HELD-OUT documents
    * — the train/score split lm1 deliberately avoids: the model
    * (trigram, bigram, unigram counts) is trained on the base split
    * (doc_id % 10 != 0) and scores the delta split, so unseen
    * trigrams genuinely exercise the backoff chain
    * c123/c12 → 0.4·c23/c2 → 0.16·c3/T → 0.16·0.5/T (OOV). This is
    * the Brants-et-al. "stupid backoff" used at web scale precisely
    * because it needs no discounting — scores are ratios of exact
    * integer counts, which is also what makes the whole model
    * cross-engine exact.
    *
    * Scale shape: three count tables (map-side-combinable, keyed on
    * the grams), then the scoring stream LEFT-joins each on its own
    * key — all co-keyed shuffles; one scalar (T) to the driver.
    */
  def trigramBackoffPerplexity(spark: SparkSession, dir: String,
                               k: Int = 20): DataFrame = {
    val w = Tables.documents(spark, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
    val base = w.filter(col("doc_id") % 10 =!= 0)
    val delta = w.filter(col("doc_id") % 10 === 0)

    def positions(df: DataFrame, n: Int, names: Seq[String]): DataFrame = df
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("ws")) - lit(n)),
        i => struct(names.zipWithIndex.map { case (nm, o) =>
          element_at(col("ws"), i + lit(o + 1)).as(nm) }: _*))).as("g"))
      .select(col("doc_id") +: names.map(nm => col(s"g.$nm")): _*)

    val t3 = positions(base, 3, Seq("w1", "w2", "w3"))
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c123"))
    val t2 = positions(base, 2, Seq("w1", "w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2g"))
    val t1 = base.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1g"))
    val bigT = t1.agg(sum(col("c1g"))).head.getLong(0) // control-plane scalar

    val pos = positions(delta, 3, Seq("w1", "w2", "w3"))
    val b12 = t2.select(col("w1").as("a1"), col("w2").as("a2"), col("c2g").as("c12"))
    val b23 = t2.select(col("w1").as("b2"), col("w2").as("b3"), col("c2g").as("c23"))
    val u2 = t1.select(col("w").as("uw2"), col("c1g").as("cu2"))
    val u3 = t1.select(col("w").as("uw3"), col("c1g").as("cu3"))

    val score =
      when(col("c123").isNotNull, col("c123").cast("double") / col("c12"))
        .when(col("c23").isNotNull,
          lit(0.4) * (col("c23").cast("double") / col("cu2")))
        .when(col("cu3").isNotNull,
          lit(0.4) * (lit(0.4) * (col("cu3").cast("double") / lit(bigT.toDouble))))
        .otherwise(lit(0.4) * (lit(0.4) * (lit(0.5) / lit(bigT.toDouble))))

    pos
      .join(t3, Seq("w1", "w2", "w3"), "left")
      .join(b12, col("w1") === col("a1") && col("w2") === col("a2"), "left")
      .join(b23, col("w2") === col("b2") && col("w3") === col("b3"), "left")
      .join(u2, col("w2") === col("uw2"), "left")
      .join(u3, col("w3") === col("uw3"), "left")
      .select(col("doc_id"),
        round(-log(score), 8).cast("decimal(20,8)").as("nll"))
      .groupBy(col("doc_id"))
      .agg(sum(col("nll")).as("s"), count(lit(1)).as("n_pos"))
      .select(col("doc_id"), col("n_pos"),
        round(col("s").cast("double") / col("n_pos"), 6).as("avg_nll"),
        round(exp(col("s").cast("double") / col("n_pos")), 6).as("ppl"))
      .orderBy(desc("ppl"), asc("doc_id"))
      .limit(k)
  }

  /** Gated nb1: MULTINOMIAL NAIVE BAYES language classifier with a
    * held-out confusion matrix — the supervised-classification family
    * the pipeline was missing: train add-one-smoothed per-class token
    * models on a deterministic 80% hash split (s1's md5 mechanism),
    * score the held-out 20%, and report true×predicted counts (the
    * artifact a labeling-quality review actually reads).
    *
    * Scale shape: the model is a (class, token) count table — the
    * same map-side-combinable aggregation as the LMs above — and
    * scoring joins held-out term frequencies to it on the token key,
    * fanned out by the #classes-row class table (broadcast). Per-doc
    * log-likelihoods are per-term `round(tf·ln p, 8)` DECIMAL(20,8)
    * sums (order-invariant, libm-drift-proof — the lm1 discipline),
    * and the arg-max is a min-struct aggregation over exact decimals,
    * so the predicted class is bit-stable across engines. No driver
    * transfer beyond the vocabulary-size scalar.
    */
  def naiveBayesConfusion(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        words(lower(trim(col("text")))).as("ws"),
        (md5(col("doc_id").cast("string")) < "cccccccc").as("is_train"))
    val tok = docs.select(col("doc_id"), col("lang"), col("is_train"),
      explode(col("ws")).as("w"))
    val train = tok.filter(col("is_train"))
    val cls = train.groupBy(col("lang").as("cand"))
      .agg(count(lit(1)).as("n_tok"))
    val vocab = train.agg(countDistinct(col("w"))).head.getLong(0)
    val cnt = train.groupBy(col("lang").as("cand"), col("w"))
      .agg(count(lit(1)).as("c"))
    val prior = docs.filter(col("is_train"))
      .groupBy(col("lang").as("cand")).agg(count(lit(1)).as("nd"))
    val priorTot = docs.filter(col("is_train")).count()
    val testTf = tok.filter(!col("is_train"))
      .groupBy(col("doc_id"), col("lang").as("true_lang"), col("w"))
      .agg(count(lit(1)).as("tf"))
    // Every held-out term × every class; unseen (class, token) pairs
    // fall to the 1/(n_tok+V) smoothing mass via the left join.
    val terms = testTf.crossJoin(broadcast(cls))
      .join(cnt, Seq("cand", "w"), "left")
      .select(col("doc_id"), col("true_lang"), col("cand"),
        round(col("tf").cast("double")
          * log((coalesce(col("c"), lit(0L)).cast("double") + 1.0)
            / (col("n_tok") + vocab).cast("double")), 8)
          .cast("decimal(20,8)").as("term"))
    val post = terms.groupBy(col("doc_id"), col("true_lang"), col("cand"))
      .agg(sum(col("term")).as("ll"))
      .join(broadcast(prior), "cand")
      .withColumn("post", col("ll")
        + round(log(col("nd").cast("double") / priorTot.toDouble), 8)
          .cast("decimal(20,8)"))
    post.groupBy(col("doc_id"), col("true_lang"))
      .agg(min(struct((-col("post")).as("neg"), col("cand"))).as("best"))
      .groupBy(col("true_lang"), col("best.cand").as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("true_lang"), col("pred_lang"))
  }
}
