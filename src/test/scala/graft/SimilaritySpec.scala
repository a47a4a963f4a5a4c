package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, VectorOps}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of a vector with itself is 1") {
    val one = Seq((1L, Array(0.5f, -1.0f, 2.0f))).toDF("vec_id", "embedding")
      .select(VectorOps.toDoubleArray(col("embedding")).as("v"))
      .select(VectorOps.cosine(col("v"), col("v")).as("c"))
      .collect()(0).getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("brute-force knn: ranks are 1..k, scores non-increasing, no self-match") {
    val rows = Similarity.knnBrute(spark, sf, nQueries = 3, k = 5).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(2)).toSeq == (1 to 5))
      val scores = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(!rs.map(_.getLong(1)).contains(q))
    }
  }

  test("IVF search: sane shape and recall against brute force") {
    val brute = Similarity.knnBrute(spark, sf, nQueries = 5, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfSearch(spark, sf, nQueries = 5, k = 10,
      nLists = 8, nProbe = 4).collect()
    val byQuery = ivf.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).toSeq.sorted == (1 to rs.length))
    }
    val hits = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(hits).size.toDouble / brute.size
    // probing half the cells of near-uniform random data: recall is
    // data-dependent; require clearly-better-than-nothing
    assert(recall >= 0.3, s"IVF recall too low: $recall")
  }

  test("derived nLists bounds within-cluster mass by construction (r13)") {
    import graft.operators.Similarity.derivedNLists
    // Formula: ceil(n/target), floored at the historical 16 so every
    // test-SF corpus keeps its round-12 clustering bit-for-bit.
    assert(derivedNLists(500L) == 16)
    assert(derivedNLists(2000L) == 16)
    assert(derivedNLists(16L * 4096) == 16)
    assert(derivedNLists(16L * 4096 + 1) == 17)
    assert(derivedNLists(100L * 4096) == 100)
    // The ≤0 default path derives from the actual corpus (sf0.001 has
    // 500 vectors → 16 lists, matching the pre-r13 constant).
    val c = Similarity.ivfCentroids(spark, sf, iters = 1)
    assert(c.length == 16)
    // Planted oversized corpus: 3000 synthetic vectors at target 100 →
    // 30 cells, so blocking gets FINER as the corpus grows and the
    // expected cluster size stays ≈ target instead of n/16.
    import spark.implicits._
    val synth = (0L until 3000L).map { id =>
      (id, (0 until 64).map(d => ((id * 31 + d * 7) % 97).toDouble / 97.0).toArray)
    }.toDF("vec_id", "v")
    val nl = derivedNLists(3000L, targetClusterSize = 100L)
    assert(nl == 30)
    val cs = Similarity.ivfCentroidsFrom(synth, nl, iters = 1)
    assert(cs.length == 30)
    val assigned = Similarity.assignListIds(synth, cs)
      .groupBy("list_id").count().collect()
    assert(assigned.map(_.getLong(1)).sum == 3000L)
    assert(assigned.length > 16, "corpus growth must produce finer blocking")
  }

  test("LSH ANN returns a subset of plausible neighbors with exact scores") {
    val brute = Similarity.knnBrute(spark, sf, nQueries = 5, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val lsh = Similarity.lshNeighbors(spark, sf, nQueries = 5, k = 10).collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      // every LSH hit that also appears in the brute top-50 must carry
      // the identical exact re-ranked score
      brute.get(key).foreach(s => assert(s == r.getDouble(3)))
    }
  }

  test("BM25: positive scores, only term-bearing docs, ranked descending") {
    val out = Similarity.bm25TopK(spark, sf).collect()
    assert(out.length == 10)
    assert(out.forall(_.getDouble(1) > 0.0))
    val scores = out.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every returned doc actually contains at least one query term
    val terms = Set("spark", "join", "window")
    val texts = graft.Tables.documents(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(texts(r.getLong(0)).split("\\s+").exists(terms.contains))
    }
  }

  test("PQ codebooks: shape, determinism, and code coverage") {
    val cbs = Similarity.pqCodebooks(spark, sf)
    assert(cbs.length == Similarity.PqM)
    assert(cbs.forall(_.length == Similarity.PqK))
    assert(cbs.forall(_.forall(_.length == Similarity.PqSubDim)))
    val again = Similarity.pqCodebooks(spark, sf)
    assert(cbs.map(_.map(_.toSeq).toSeq).toSeq == again.map(_.map(_.toSeq).toSeq).toSeq,
      "Lloyd training must be deterministic")
  }

  test("PQ/ADC search: shape, exact re-ranked scores, recall against brute force") {
    val brute = Similarity.knnBrute(spark, sf, nQueries = 5, k = 10).collect()
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteScores = Similarity.knnBrute(spark, sf, nQueries = 5, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val pq = Similarity.pqSearch(spark, sf, nQueries = 5, k = 10).collect()
    val byQuery = pq.groupBy(_.getLong(0))
    assert(byQuery.size == 5)
    byQuery.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).toSeq.sorted == (1 to rs.length))
    }
    // survivors are exactly re-ranked: identical scores where brute has them
    pq.foreach { r =>
      bruteScores.get((r.getLong(0), r.getLong(1)))
        .foreach(s => assert(s == r.getDouble(3)))
    }
    val hits = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bruteSet.intersect(hits).size.toDouble / bruteSet.size
    // 16-code/subspace PQ on near-uniform data with 3x re-rank headroom:
    // require clearly-better-than-random (uniform data is ANN's worst case)
    assert(recall >= 0.3, s"PQ recall too low: $recall")
  }

  test("ns1 contrastive sampling: 5 hard + 5 easy per query, hard dominate easy") {
    val rows = Similarity.contrastiveSampling(spark, sf).collect()
    assert(rows.length == 30) // 3 queries x (5 hard + 5 easy)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rs) =>
      val hard = rs.filter(_.getAs[String]("role") == "hard")
      val easy = rs.filter(_.getAs[String]("role") == "easy")
      assert(hard.length == 5 && easy.length == 5, s"query $qid roles off")
      // hard negatives sit at ranks 11-15; easy come from beyond rank
      // 30 — so every hard score bounds every easy score from above
      assert(hard.map(_.getAs[Double]("score")).min
        >= easy.map(_.getAs[Double]("score")).max,
        s"query $qid: an easy negative outranks a hard one")
      // and the query itself is never sampled
      assert(!rs.exists(_.getAs[Long]("vec_id") == qid))
    }
    // hard negatives must exclude the true top-10 (those are positives)
    val top10 = Similarity.knnBrute(spark, sf, nQueries = 3, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    rows.filter(_.getAs[String]("role") == "hard").foreach { r =>
      assert(!top10.contains((r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))),
        "hard negative collides with a positive")
    }
  }

  test("ss8 hybrid RRF: scores bounded, ordered, and sourced from both rankers") {
    val rows = Similarity.hybridRrfTopK(spark, sf).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Double]("rrf"))
    assert(scores.toSeq == scores.sortBy(-_).toSeq, "not ordered by fused score")
    // one list contributes at most 1/61; both at most 1/61 + 1/61
    assert(scores.forall(s => s > 0 && s <= 2.0 / 61 + 1e-9))
    // exact recomputation: fuse the two component rankings locally
    val rt = Similarity.bm25TopK(spark, sf, k = 20).collect()
      .sortBy(r => (-r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
      .zipWithIndex.map { case (r, i) => r.getAs[Long]("doc_id") -> (i + 1) }
      .toMap
    val knn = Similarity.knnBrute(spark, sf, nQueries = 1, k = 500).collect()
      .filter(r => r.getAs[Long]("neighbor_id") < 500)
      .sortBy(_.getAs[Int]("rank"))
      .take(20)
      .zipWithIndex.map { case (r, i) => r.getAs[Long]("neighbor_id") -> (i + 1) }
      .toMap
    val fused = (rt.keySet ++ knn.keySet).toSeq.map { id =>
      val s = rt.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        knn.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      id -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("rrf"))).toSeq
      == fused, "operator fusion differs from local recomputation")
  }

  test("rec2 wide recall: shape, bounds, and candidate-depth dominance") {
    val wide = Similarity.annRecallAtK(spark, sf, nQueries = 20, k = 10,
      candidates = 50).collect()
    assert(wide.length == 20)
    wide.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hits") <= 10L)
    }
    // More candidates can only help: per query, recall at depth 50
    // dominates recall at depth 10 (the exact re-rank sees a superset).
    val narrow = Similarity.annRecallAtK(spark, sf, nQueries = 20, k = 10,
      candidates = 10).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("recall")).toMap
    wide.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Double]("recall") >= narrow(q) - 1e-9,
        s"query $q: recall shrank when candidate depth grew")
    }
  }

  test("xl1 margin mining: full local recomputation of the margin chain") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // Local replay with the SAME op order: left-fold dot, cos =
    // dot / (sqrt(n_a) * sqrt(n_b)), round-6 before rank/mean.
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // The gated form mines ONE query batch: the 1-in-16 source shard
    // (vec_id % 32 == 0) — replayed here; a queryShards=1 run is
    // checked against the same replay with allSrc below.
    val allSrc = vecs.keys.filter(_ % 2 == 0).toSeq.sorted
    val srcIds = allSrc.filter(_ % 32 == 0)
    val tgtIds = vecs.keys.filter(_ % 2 == 1).toSeq.sorted
    val score = (for (s <- allSrc; t <- tgtIds)
      yield (s, t) -> r6(cos(vecs(s), vecs(t)))).toMap
    def si(x: Double): Long = math.round(x * 1e6)
    // top-k by (rounded score desc, id asc) → exact integer sum + count
    def topSum(scores: Seq[(Long, Double)], k: Int): (Long, Long) = {
      val top = scores.sortBy { case (id, sc) => (-sc, id) }.take(k)
      (top.map(p => si(p._2)).sum, top.length.toLong)
    }
    // Batch semantics: μk(tgt) is the top-k over the BATCH's sources.
    def replay(batch: Seq[Long]): Seq[(Long, Long, Double, Double, Boolean)] = {
      val muS = batch.map(s => s -> topSum(tgtIds.map(t => t -> score((s, t))), 4)).toMap
      val muT = tgtIds.map(t => t -> topSum(batch.map(s => s -> score((s, t))), 4)).toMap
      batch.map { s =>
        val best = tgtIds.flatMap { t =>
          val (ss, ks) = muS(s); val (st, kt) = muT(t)
          val den = ss * kt + st * ks
          if (den <= 0) None
          else Some((t, score((s, t)),
            r6((2L * si(score((s, t))) * ks * kt).toDouble / den.toDouble)))
        }.minBy { case (t, _, m) => (-m, t) }
        (s, best._1, best._2, best._3, best._3 >= 1.05)
      }
    }
    def run(shards: Int): Seq[(Long, Long, Double, Double, Boolean)] =
      Similarity.marginMining(spark, sf, queryShards = shards).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getBoolean(4))).toSeq
    val got = run(16) // the gated batch form
    assert(got == replay(srcIds), "sharded margin mining differs from local replay")
    assert(got.map(_._1) == srcIds, "one row per batch source, ordered")
    val full = run(1) // queryShards=1 recovers the full brute readout
    assert(full == replay(allSrc), "full margin mining differs from local replay")
    assert(full.map(_._1) == allSrc, "one row per source, ordered")
    // Non-degenerate decision: a best-of-neighborhood cosine sits
    // above its own neighborhood mean, so margins exceed 1 somewhere.
    assert(full.exists(_._5), "no pair accepted — threshold degenerate")
  }

  test("xl1 margin normalizes hubs: an exclusive pair outranks a hub match") {
    // Synthetic 4-dim corpus written as an embeddings table: target 1
    // is a HUB equidistant from both sources (cos 1/√2 ≈ 0.707 to
    // each); target 3 is exclusively aligned with source 0 at a LOWER
    // raw cosine (0.65). Raw cosine for source 0 therefore prefers
    // the hub, but the margin ratio must prefer the exclusive target:
    //   margin(s0,t1) = .707/((.679+.707)/2) ≈ 1.02
    //   margin(s0,t3) = .650/((.679+.325)/2) ≈ 1.30
    // because the hub's own neighborhood mean (μk = .707, it is near
    // EVERYTHING) normalizes its similarity away, while the exclusive
    // target's tiny μk (= .325) amplifies its one genuine alignment.
    import spark.implicits._
    val dir = tmpDir("xl1hub")
    val rows = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f), 0),      // src 0
      (2L, Array(0f, 1.0f, 0f, 0f), 0),      // src 2
      (1L, Array(1.0f, 1.0f, 0f, 0f), 1),    // tgt 1: the hub
      (3L, Array(0.65f, 0f, 0.76f, 0f), 1),  // tgt 3: aligned with src 0 only
      (5L, Array(0f, 0f, 0f, 1.0f), 1))      // tgt 5: unrelated
      .toDF("vec_id", "embedding", "label")
    rows.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.marginMining(spark, dir, k = 2, queryShards = 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // Raw cosine would send src 0 to the hub (0.707 > 0.65)…
    assert(out(0L)._2 < 0.71, s"exclusive target's raw cosine drifted: ${out(0L)}")
    // …but margin routes it to the exclusive target.
    assert(out(0L)._1 == 3L, s"hub won over the exclusive pair: ${out(0L)}")
    // src 2 has no exclusive alignment: the hub stays its best match.
    assert(out(2L)._1 == 1L, s"src 2 should keep the hub: ${out(2L)}")
  }
}
