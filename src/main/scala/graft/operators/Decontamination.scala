package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Benchmark decontamination — the n-gram overlap check every LLM
  * training-data pipeline runs before releasing a corpus: does any
  * held-out (eval/test) document share a long word n-gram with the
  * training split? (The reference computes nothing over text — this is
  * a north-star extension; split semantics mirror
  * [[TextAnalysis.hashSplit]].)
  *
  * Scale design (the part that matters at 100 TB):
  *  - The training side is reduced to DISTINCT gram keys before the
  *    join — one row per gram, no doc payload. A gram duplicated
  *    across millions of training docs (boilerplate) collapses to a
  *    single join row, so the probe join can never go quadratic: each
  *    held-out gram matches at most one key row.
  *  - Grams become fixed-width 16-hex md5 keys (64 bits) at the source,
  *    so the shuffle carries 16-byte keys, never 8-word strings.
  *  - Both shuffles key on the gram hash; the held-out side is a small
  *    fraction of the corpus (2/16 buckets) by construction.
  *  - Per-doc dedup (`distinct` on (doc, gram)) happens before the
  *    join, map-side combinable.
  */
object Decontamination {

  /** Hex buckets (first md5 char of doc_id) forming the training split:
    * 0-b, 12/16 of the corpus — identical to TextAnalysis.hashSplit.
    * Held-out test split = e-f; val (c-d) takes no part here.
    */
  private val TestBuckets = Seq("e", "f")
  private val ValBuckets  = Seq("c", "d")

  /** Per-held-out-doc contamination report (gate dc1): total distinct
    * word `n`-grams, how many also occur anywhere in the training
    * split, and the contaminated fraction. A doc with
    * contaminated_frac near 1 is a verbatim/near copy of training
    * data and must be dropped from the benchmark.
    */
  /** Positional word n-grams keyed by 64-bit md5 prefix:
    * (doc_id, split bucket, 0-based position, gram key).
    */
  private def gramsWithPos(spark: SparkSession, dir: String, n: Int): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("h1"),
        TextAnalysis.words(col("text")).as("ws"))
      .select(col("doc_id"), col("h1"),
        posexplode(when(size(col("ws")) >= n,
          transform(sequence(lit(0), size(col("ws")) - lit(n)),
            i => concat_ws(" ", slice(col("ws"), i + lit(1), lit(n)))))
          .otherwise(array().cast("array<string>"))))
      .select(col("doc_id"), col("h1"), col("pos").cast("long").as("pos"),
        substring(md5(col("col")), 1, 16).as("g"))

  /** Distinct gram keys of the training split — one row per gram, no
    * doc payload, so probe joins against it cannot go quadratic.
    */
  private def trainGramKeys(grams: DataFrame): DataFrame =
    grams
      .filter(!col("h1").isin((TestBuckets ++ ValBuckets).map(x => x: Any): _*))
      .select(col("g")).distinct()

  def ngramOverlap(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    // Distinct per-doc grams: overlap counts ignore repeat positions.
    val grams = gramsWithPos(spark, dir, n)
      .select(col("doc_id"), col("h1"), col("g")).distinct()
    val trainGrams = trainGramKeys(grams).withColumn("hit", lit(1))
    val perDoc = grams
      .filter(col("h1").isin(TestBuckets.map(x => x: Any): _*))
      .join(trainGrams, Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_contaminated"))
    // Held-out docs shorter than n words produce no grams; the report
    // must still name them (n_grams = 0, frac null = "nothing to
    // check"), else consumers read absence as "checked and clean".
    val heldOut = Tables.documents(spark, dir)
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("h1"))
      .filter(col("h1").isin(TestBuckets.map(x => x: Any): _*))
      .select(col("doc_id"))
    heldOut
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contaminated_frac",
        when(col("n_grams") > 0,
          round(col("n_contaminated").cast("double") / col("n_grams").cast("double"), 6)))
      .orderBy(col("doc_id"))
  }

  /** Span localization (gate dc2): WHERE the contamination sits in each
    * held-out doc — first/last contaminated gram position and the
    * number of maximal contiguous runs (gaps-and-islands: pos −
    * row_number is constant within a run). Span-level reporting is
    * what lets a pipeline excise contaminated windows instead of
    * dropping whole documents. The per-doc window runs over hit
    * positions only (≤ doc length), partitioned by doc — fully
    * parallel.
    */
  def contaminatedSpans(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val grams = gramsWithPos(spark, dir, n)
    val hits = grams
      .filter(col("h1").isin(TestBuckets.map(x => x: Any): _*))
      .join(trainGramKeys(grams), Seq("g"))
      .select(col("doc_id"), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    hits
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"),
        min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"),
        countDistinct(col("grp")).as("n_spans"))
      .orderBy(col("doc_id"))
  }

  /** Gated dc3: Bloom-prefiltered exact decontamination — the shape the
    * overlap check takes once the training gram set outgrows what an
    * exact shuffle join should carry. The training side is folded into
    * B per-bucket Bloom sketches (Spark's own `bloom_filter_agg`
    * machinery via [[graft.functions.BloomFns]] — a partial+final
    * typed aggregate, built distributed, probe codegen'd); held-out
    * grams probe the sketch of their bucket FIRST, and only the
    * survivors (true hits + the sketch's few false positives) pay the
    * exact semi join against the real gram keys. False negatives are
    * impossible, and the exact confirm removes false positives, so the
    * result is byte-identical to the plain exact join — the oracle is
    * the plain SQL overlap with no sketch anywhere.
    *
    * At 100 TB: the eval split is a tiny fraction of the corpus but
    * the TRAIN gram set scales with it — the Bloom bank is
    * `B × bloomBytes` however many grams there are (B grows with the
    * corpus to hold per-bucket capacity) and ships to tasks as plan
    * metadata exactly like a broadcast-join build; the exact-confirm
    * shuffle then carries only `contamination_rate + fpp` of the eval
    * grams instead of all of them. Uses a 7-gram split disjoint from
    * dc1's (doc_id mod 10, not the md5 bucket) so the two gates cover
    * different split machinery.
    */
  def bloomPrefilteredOverlap(spark: SparkSession, dir: String,
                              n: Int = 7, buckets: Int = 16): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.words(col("text")).as("ws"))
      .select(col("doc_id"),
        explode(when(size(col("ws")) >= n,
          transform(sequence(lit(0), size(col("ws")) - lit(n)),
            i => concat_ws(" ", slice(col("ws"), i + lit(1), lit(n)))))
          .otherwise(array().cast("array<string>"))).as("gram"))
      .select(col("doc_id"), substring(md5(col("gram")), 1, 16).as("g"))
      .distinct()
      .persist() // three consumers: train build, eval probe, per-doc totals
    val isEval = col("doc_id") % 10 === 7
    // Persisted (round 14): read THREE times — the sizing count, the
    // Bloom-bank build, and the exact-confirm semi-join — and each read
    // previously re-ran the full distinct exchange over the train-side
    // gram set on top of the persisted (doc_id, g) frame.
    val train = grams.filter(!isEval).select(col("g")).distinct().persist()
    val trainBucketed = train
      .withColumn("bucket", pmod(xxhash64(col("g")), lit(buckets.toLong)))
    // Size sketches to the ACTUAL per-bucket load (one cheap count
    // action): BloomFilterAggregate allocates its full bit array in
    // every partial-aggregate buffer (tasks × buckets of them), so a
    // static worst-case capacity multiplies straight into build
    // memory/serialization. fpp only costs extra exact-confirm work,
    // never correctness, so ~10 bits/key is plenty. The collect() is
    // the bank's B serialized sketches — a bounded control-plane
    // transfer, the same shape as a broadcast-join build, never rows.
    val perBucket = math.max(1024L,
      train.count() / buckets + 1L)
    val bloomRows = trainBucketed.groupBy(col("bucket"))
      .agg(graft.functions.BloomFns
        .bloomAgg(col("g"), perBucket, perBucket * 10L).as("bloom"))
      .collect()
    val bank = Array.fill[Array[Byte]](buckets) {
      val empty = org.apache.spark.util.sketch.BloomFilter.create(1)
      val bos = new java.io.ByteArrayOutputStream()
      empty.writeTo(bos)
      bos.toByteArray
    }
    bloomRows.foreach(r => bank(r.getLong(0).toInt) = r.getAs[Array[Byte]](1))
    val evalGrams = grams.filter(isEval)
      .withColumn("bucket", pmod(xxhash64(col("g")), lit(buckets.toLong)))
    val survivors = evalGrams
      .filter(graft.functions.BloomFns
        .bankContains(bank.toSeq, col("bucket"), col("g")))
      .select(col("doc_id"), col("g"))
    // Exact confirm: train is distinct on g, so the semi join counts
    // each surviving eval gram at most once and kills Bloom FPs.
    val hits = survivors
      .join(train, Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    val perDoc = grams.filter(isEval)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    perDoc.join(hits, Seq("doc_id"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"))
      .orderBy(col("doc_id"))
  }
}
