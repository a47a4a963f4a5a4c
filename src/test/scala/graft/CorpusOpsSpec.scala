package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontamination, Dedup, Packing, TextAnalysis}

/** Round-4 corpus-curation operators: decontamination (dc1), segment
  * dedup (dd8), repetition stats (t13), sequence packing (pk1).
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("decontamination flags the planted near-copy held-out doc") {
    // The fixture corpus plants near-dups; doc 211 (md5 bucket e/f) is a
    // shifted copy of a training doc — every one of its 8-grams occurs in
    // the training split.
    val out = Decontamination.ngramOverlap(spark, sf).collect()
    assert(out.nonEmpty)
    // every held-out doc appears exactly once, fractions in [0,1]
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.forall { r =>
      val f = r.getDouble(3); f >= 0.0 && f <= 1.0 &&
        r.getLong(2) <= r.getLong(1)
    })
    val full = out.filter(_.getDouble(3) == 1.0)
    assert(full.nonEmpty, "expected at least one fully contaminated held-out doc")
  }

  test("decontamination held-out set matches the hashSplit test bucket") {
    val testDocs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("h"))
      .filter(col("h").isin("e", "f"))
      .select("doc_id").as[Long].collect().toSet
    val reported = Decontamination.ngramOverlap(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    // all fixture docs have >= 8 words, so the report is total over the split
    assert(reported == testDocs)
  }

  test("domain cap keeps at most cap docs per host, deterministically") {
    val out = graft.operators.Curation.domainCap(spark, sf, cap = 3).collect()
    val byHost = out.groupBy(_.getString(1))
    assert(byHost.values.forall(_.length <= 3))
    assert(out.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 3))
    // stats cover every host the cap saw, and kept docs exist in stats
    val stats = graft.operators.Curation.domainStats(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byHost.keySet.subsetOf(stats.keySet))
    // hosts with >= 3 docs keep exactly 3
    byHost.foreach { case (h, kept) =>
      assert(kept.length == math.min(3L, stats(h)).toInt)
    }
    // second run identical (md5 rank has no RNG state)
    val again = graft.operators.Curation.domainCap(spark, sf, cap = 3).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("overlapping chunks: full coverage, clamped tail, stride overlap") {
    val out = Packing.overlappingChunks(spark, sf, chunkSize = 64, stride = 48)
      .collect()
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), size(graft.operators.TextAnalysis.words(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.keySet == lens.keySet) // every doc chunked, even short ones
    byDoc.foreach { case (id, rows) =>
      val n = lens(id)
      val sorted = rows.sortBy(_.getInt(1))
      // chunk 0 starts at 0; last chunk ends exactly at n
      assert(sorted.head.getLong(2) == 0L)
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) == n.toLong)
      // all chunks full-size when the doc is, and token coverage is total
      if (n >= 64) assert(sorted.forall(_.getLong(3) == 64L))
      val covered = sorted.flatMap(r =>
        r.getLong(2) until (r.getLong(2) + r.getLong(3))).toSet
      assert(covered == (0L until n.toLong).toSet)
      // consecutive unclamped starts differ by exactly the stride
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) - a.getLong(2) <= 48L && b.getLong(2) > a.getLong(2))
        case _ =>
      }
      // chunk text token count matches n_tokens
      assert(rows.forall(r => r.getString(4).split(" ").length == r.getLong(3)))
    }
  }

  test("decontamination reports held-out docs shorter than n as n_grams=0") {
    // md5 first-hex buckets: doc 3 and 5 -> 'e' (held out), doc 6 -> '1'
    // (training). Doc 3 is too short for any 8-gram; it must still
    // appear in the report (n_grams = 0, frac null), not be silently
    // omitted and read as "checked and clean".
    val docs = Seq(
      (6L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (5L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "tiny doc")
    ).toDF("doc_id", "text")
    val dir = tmpDir("decontshort")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Decontamination.ngramOverlap(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(3L, 5L))
    assert(out(3L).getLong(1) == 0 && out(3L).getLong(2) == 0 && out(3L).isNullAt(3))
    assert(out(5L).getLong(1) == 1 && out(5L).getLong(2) == 1 &&
      out(5L).getDouble(3) == 1.0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("segment dedup keeps first occurrence and drops later copies") {
    val docs = Seq(
      (0L, "a b c d e f g h x1 x2 x3 x4 x5 x6 x7 x8"),   // segs: [a..h], [x1..x8]
      (1L, "a b c d e f g h y1 y2 y3 y4 y5 y6 y7 y8"),   // first seg duplicates doc 0
      (2L, "short doc")                                   // < 8 words: no segments
    ).toDF("doc_id", "text")
    val dir = tmpDir("segdedup")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.segmentDedup(spark, dir).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getLong(1) == 2 && byId(0L).getLong(2) == 2)
    assert(byId(1L).getLong(1) == 2 && byId(1L).getLong(2) == 1)
    assert(byId(1L).getString(3) == "y1 y2 y3 y4 y5 y6 y7 y8")
    assert(byId(2L).getLong(1) == 0 && byId(2L).getString(3) == "")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("segment dedup is idempotent on already-deduped corpus output") {
    val first = Dedup.segmentDedup(spark, sf)
    // n_kept <= n_segs everywhere; global kept-segment hashes are unique
    val bad = first.filter(col("n_kept") > col("n_segs")).count()
    assert(bad == 0)
    val keptSegs = first.filter(length(col("cleaned_text")) > 0)
      .select(explode(split(col("cleaned_text"), " ")).as("w")).count()
    assert(keptSegs > 0)
  }

  test("repetition stats: degenerate repeated doc scores near 1 on dup fraction") {
    val docs = Seq(
      (0L, "spam spam spam spam spam spam"),
      (1L, "one two three four five six")
    ).toDF("doc_id", "text")
    val dir = tmpDir("repstats")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.repetitionStats(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val spammy = out(0L)
    assert(spammy.getDouble(2) < 0.2)                   // ttr = 1/6
    assert(spammy.getDouble(3) == 0.8)                  // 5 bigram occurrences, 1 distinct
    assert(spammy.getString(4) == "spam spam")
    assert(spammy.getDouble(5) == 1.0)                  // all bigrams identical
    val clean = out(1L)
    assert(clean.getDouble(2) == 1.0 && clean.getDouble(3) == 0.0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("sequence packing offsets are the exact prefix sum in doc order") {
    val out = Packing.chunkedTokenStream(spark, sf).orderBy("doc_id").collect()
    var acc = 0L
    out.foreach { r =>
      assert(r.getLong(2) == acc, s"offset mismatch at doc ${r.getLong(0)}")
      acc += r.getLong(1)
      assert(r.getLong(3) <= r.getLong(4))              // start_chunk <= end_chunk
      assert(r.getLong(3) == r.getLong(2) / 256)
    }
  }

  test("sequence packing is invariant to block size (pure algebra, not layout)") {
    val a = Packing.chunkedTokenStream(spark, sf, blockSize = 64).collect()
    val b = Packing.chunkedTokenStream(spark, sf, blockSize = 7).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("materialized chunks are exact 256-token windows of the concatenated stream") {
    val out = Packing.materializedChunks(spark, sf).collect()
    assert(out.length == 20)
    // all but possibly the last requested chunk are full windows
    out.dropRight(1).foreach(r => assert(r.getLong(1) == 256))
    out.foreach(r => assert(r.getString(2).split(" ").length == r.getLong(1)))
    // continuity: the flattened chunks equal the doc-ordered token stream prefix
    val stream = Tables.documents(spark, sf).orderBy("doc_id").collect()
      .flatMap(_.getString(1).trim.split("\\s+"))
    val packed = out.sortBy(_.getLong(0)).flatMap(_.getString(2).split(" "))
    assert(packed.toSeq == stream.take(packed.length).toSeq)
  }

  test("source mixture: balanced, bounded, and deterministic") {
    val out = TextAnalysis.sourceMixture(spark, sf).collect()
    assert(out.nonEmpty)
    val budget = out.map(_.getLong(1)).min
    out.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1))           // sampled <= source mass
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
      if (r.getLong(1) == budget) {
        assert(r.getDouble(2) == 1.0)                // smallest source kept whole
        assert(r.getLong(4) == budget)
      }
    }
    val again = TextAnalysis.sourceMixture(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("bpe pair counts: 2-char pairs, non-increasing, consistent with corpus mass") {
    val out = TextAnalysis.bpePairCounts(spark, sf).collect()
    assert(out.length == 20)
    assert(out.forall(_.getString(0).length == 2))
    val ns = out.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("adaptive quality filter drops exactly the below-threshold tail") {
    val kept = graft.operators.Curation.adaptiveQualityFilter(spark, sf).collect()
    val all = TextAnalysis.tokenStats(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept.nonEmpty && kept.length < all.size)
    val thr = kept.map(_.getLong(1)).min
    // kept = exactly the docs at/above the threshold; dropped all below
    assert(kept.length == all.values.count(_ >= thr))
    val dropped = all.keySet -- kept.map(_.getLong(0)).toSet
    assert(dropped.forall(id => all(id) < thr))
    // the threshold is the ceil(0.1N)-th smallest count
    val sorted = all.values.toSeq.sorted
    val k = math.ceil(0.1 * all.size).toInt
    assert(thr == sorted(k - 1) || sorted.count(_ < thr) < k)
  }

  test("vocab encoding: ids bounded, OOV = 0, one id per word") {
    val out = TextAnalysis.vocabEncode(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getInt(3) >= 0 && r.getInt(3) <= 25))
    // a word maps to exactly one id everywhere
    val byWord = out.groupBy(_.getString(2)).view.mapValues(_.map(_.getInt(3)).toSet)
    assert(byWord.values.forall(_.size == 1))
    // the most frequent corpus word must carry id 1
    val top = TextAnalysis.topTokens(spark, sf).collect()(0).getString(0)
    byWord.get(top).foreach(ids => assert(ids == Set(1)))
  }

  test("contaminated spans agree with the overlap report") {
    val spans = Decontamination.contaminatedSpans(spark, sf).collect()
    val overlap = Decontamination.ngramOverlap(spark, sf).collect()
      .filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    assert(spans.map(_.getLong(0)).toSet == overlap)
    spans.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getLong(2) <= r.getLong(3))           // first_pos <= last_pos
      assert(r.getLong(4) >= 1)                      // at least one span
      assert(r.getLong(4) <= r.getLong(1))           // spans <= hit count
    }
  }

  test("c4 capstone: decontamination is live and accounting closes") {
    import org.apache.spark.sql.functions._
    val kept = graft.operators.Curation.curationV3(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val d = docs.join(broadcast(
      graft.operators.TextAnalysis.groupSplitMap(docs)), "source")
    val trainInRange = d.filter(col("split") === "train"
      && col("n_chars").between(120, 20000))
    // cross-split near-dups exist in the corpus, so c4 must drop them:
    // kept strictly fewer than the length-gated train docs
    val keptTotal = kept.map(_.getAs[Long]("n_kept")).sum
    assert(keptTotal < trainInRange.count(),
      "no contaminated train doc was dropped - decontamination is vacuous")
    // every cross-split LSH pair's train member is absent from kept sources' budget
    val pairs = graft.operators.Dedup.minhashLshPairs(spark, sf).collect()
    val split = d.select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val contaminated = pairs.flatMap { p =>
      val (a, b) = (p.getAs[Long]("doc_a"), p.getAs[Long]("doc_b"))
      (split(a) == "train", split(b) == "train") match {
        case (true, false) => Some(a)
        case (false, true) => Some(b)
        case _ => None
      }
    }.toSet
    assert(contaminated.nonEmpty, "test corpus must contain cross-split near-dups")
    val keptPlusDropped = trainInRange
      .filter(!col("doc_id").isin(contaminated.toSeq: _*))
    assert(keptTotal == keptPlusDropped.count(),
      "kept != length-gated train minus contaminated")
  }
}
