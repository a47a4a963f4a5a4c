package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Round-9 skew guards: basket caps on the frequent-itemset
  * self-joins (fi1/fi2) — a planted mega-basket must contribute
  * O(cap²)/O(cap³) candidates, never its own square/cube, and any
  * cap at or above the true max basket size is bit-exact.
  */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  /** 60 small baskets with a known frequent pair (10,20) plus one
    * planted 2000-item mega-basket (a crawler cart / bulk EDI order).
    */
  private def plantedBaskets() = {
    val small = (1L to 60L).flatMap(o => Seq(
      (o, 10L), (o, 20L), (o, 1000L + o)))
    val hot = (1L to 2000L).map(i => (9999L, 5000L + i))
    (small ++ hot).toDF("l_orderkey", "l_partkey")
  }

  test("fi1 basket cap: planted mega-basket contributes only C(cap,2) pairs") {
    val items = plantedBaskets()
    val cap = 16
    val rows = Relational
      .frequentItemPairsFrom(spark, items, minSupport = 1L, basketCap = cap)
      .collect()
    // The mega-basket survives as its cap smallest partkeys (5001..5016):
    // exactly C(16,2) = 120 support-1 pairs — not C(2000,2) ≈ 2M.
    val hotPairs = rows.filter(r => r.getLong(0) >= 5000L)
    assert(hotPairs.length == cap * (cap - 1) / 2,
      s"expected ${cap * (cap - 1) / 2} capped hot pairs, got ${hotPairs.length}")
    assert(hotPairs.forall(r =>
      r.getLong(0) <= 5000L + cap && r.getLong(1) <= 5000L + cap),
      "a truncated item leaked into the pair enumeration")
    // The corpus-frequent small-basket pair is untouched by the cap.
    val freq = rows.find(r => r.getLong(0) == 10L && r.getLong(1) == 20L)
    assert(freq.exists(_.getAs[Long]("support") == 60L))
  }

  test("fi1/fi2 caps are exact when every basket fits under them") {
    val small = plantedBaskets().filter(col("l_orderkey") =!= 9999L)
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toString).sorted.toSeq
    assert(norm(Relational.frequentItemPairsFrom(spark, small, 2L, 64)
        .collect())
      == norm(Relational.frequentItemPairsFrom(spark, small, 2L, Int.MaxValue)
        .collect()))
    assert(norm(Relational.frequentItemTriplesFrom(spark, small, 2L, 64)
        .collect())
      == norm(Relational.frequentItemTriplesFrom(spark, small, 2L, Int.MaxValue)
        .collect()))
  }

  test("ss9: changes-feed-maintained LSH index equals a rebuild at every version") {
    import graft.operators.{Similarity, VectorOps}
    val dir = tmpDir("ss9_idx_")
    try {
      val vecs = new graft.sources.TxTable(s"$dir/vecs")
      val idx = new graft.sources.TxTable(s"$dir/idx")
      val emb = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") < 400)
      def sigOf(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
        Similarity.lshSignature(
          VectorOps.toDoubleArray(col("embedding")), 6, "idx_").as("sig"))
      var seen = 0L
      // FOUR maintenance rounds (one more than the gate drives).
      (0 until 4).foreach { r =>
        vecs.append(emb.filter(col("vec_id") % 4 === r))
        val head = vecs.latestVersion().get
        idx.append(sigOf(vecs.readChanges(spark, seen, Some(head))
          .select(col("vec_id"), col("embedding"))))
        seen = head
        // Incremental index == full rebuild from the current snapshot,
        // as a SET of (vec_id, sig) rows.
        val inc = idx.snapshot(spark).select(col("vec_id"), col("sig"))
          .as[(Long, Long)].collect().sorted.toSeq
        val rebuilt = sigOf(vecs.snapshot(spark))
          .as[(Long, Long)].collect().sorted.toSeq
        assert(inc == rebuilt, s"index diverged from rebuild at round $r")
        assert(inc.map(_._1).distinct.size == inc.size, "duplicate index rows")
      }
    } finally TmpIO.deleteRecursively(new java.io.File(dir))
  }

  test("aho-corasick kernel: all match positions, overlaps included") {
    import graft.functions.AhoCorasickExpr.{acCount, acDistinct}
    def brute(t: String, pats: Seq[String]): (Long, Long) = {
      val counts = pats.map(p =>
        (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)))
      (counts.map(_.toLong).sum, counts.count(_ > 0).toLong)
    }
    val pats = Seq("aa", "ab", "window", "scan", "é1")
    val texts = Seq(
      "aaa",                 // self-overlap: "aa" matches twice
      "windowindow",         // border overlap: "window" matches twice
      "abab aa scan window", // mixed
      "é1é1x",               // non-ASCII goto path
      "",                    // empty text
      "zzz")                 // no matches
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
    val got = df.select(col("i"), acCount(col("t"), pats).as("c"),
        acDistinct(col("t"), pats).as("d"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == brute(t, pats), s"mismatch on '$t'")
    }
    // Pattern that is a substring of another: both count.
    val pats2 = Seq("scan", "scans")
    val d2 = Seq((0, "scans scan")).toDF("i", "t")
    val r2 = d2.select(acCount(col("t"), pats2).as("c"),
      acDistinct(col("t"), pats2).as("d")).head()
    assert(r2.getLong(0) == 3L && r2.getLong(1) == 2L) // scan x2 + scans x1
  }

  test("aho-corasick matches a per-pattern scan over real documents") {
    import graft.functions.AhoCorasickExpr.acCount
    val pats = graft.operators.TextAnalysis.BlockPatterns
    val d = Tables.documents(spark, sf).filter(col("doc_id") < 50)
      .select(col("doc_id"), lower(col("text")).as("t"))
    // Naive shape: one regexp_count pass per pattern (what the kernel
    // replaces); border-free patterns make the counts comparable.
    val naive = pats.map(p => regexp_count(col("t"), lit(java.util.regex.Pattern.quote(p))))
      .reduce(_ + _)
    val rows = d.select(col("doc_id"),
        acCount(col("t"), pats).as("ac"), naive.as("nv"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == r.getAs[Number](2).longValue(),
      s"doc ${r.getLong(0)}: ac ${r.getLong(1)} vs naive ${r.get(2)}"))
  }

  test("c8 capstone: blocklist filter + ES sample matches a local replay") {
    val got = graft.operators.TextAnalysis.curationV4(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    // Local replay: distinct-term filter via the kernel's own counts,
    // then the md5-uniform ES top-100.
    import graft.functions.AhoCorasickExpr.acDistinct
    val docs = Tables.documents(spark, sf).filter(col("n_chars") > 0)
      .select(col("doc_id"), col("source"), col("n_chars"),
        acDistinct(lower(col("text")),
          graft.operators.TextAnalysis.BlockPatterns).as("nt"))
      .as[(Long, String, Long, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
    }
    val sample = docs.filter(_._4 < 11)
      .map { case (id, src, nc, _) => (math.log(u(id)) / nc, id, src, nc) }
      .sortBy(t => (-t._1, t._2)).take(100)
    val expect = sample.groupBy(_._3).map { case (src, xs) =>
      (src, xs.length.toLong, xs.map(_._4).sum) }.toSeq.sortBy(_._1)
    assert(got == expect)
  }

  test("fi2 basket cap bounds the cubic enumeration on the mega-basket") {
    val items = plantedBaskets()
    val rows = Relational
      .frequentItemTriplesFrom(spark, items, minSupport = 1L, basketCap = 8)
      .collect()
    val hotTriples = rows.filter(_.getLong(0) >= 5000L)
    // C(8,3) = 56 triples from the truncated mega-basket.
    assert(hotTriples.length == 56, s"got ${hotTriples.length}")
    assert(hotTriples.forall(_.getLong(2) <= 5008L))
  }
}
