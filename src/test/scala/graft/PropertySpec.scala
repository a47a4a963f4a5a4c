package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.functions.PolyFingerprint
import graft.operators.{Dedup, Skew}

/** Property-based invariants (ScalaCheck, SURVEY §5.2): run each Prop
  * through ScalaCheck's runner and assert it passed. Data-frame-level
  * properties use small generated datasets to keep the suite fast.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: org.scalacheck.Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("prop: rhu is exact round-half-up of the integer ratio (r13)") {
    // The cross-engine quantization kernel (Learn.rhu, SQL (2a+b)//(2b))
    // must equal decimal HALF_UP division on its whole non-negative
    // domain, including magnitudes past int64/int128 — the property the
    // r12/r13 driver-divergence work leans on.
    check(forAll(Gen.chooseNum(0L, Long.MaxValue), Gen.chooseNum(1L, Long.MaxValue),
      Gen.chooseNum(0, 60), Gen.chooseNum(0, 30)) { (a0, b0, sa, sb) =>
      val a = BigInt(a0) << sa
      val b = (BigInt(b0) >> sb).max(BigInt(1))
      // Exact scale-0 HALF_UP division (java BigDecimal — no MathContext
      // precision cap, so the rounding decision is exact at any size).
      val viaDecimal = BigInt(new java.math.BigDecimal(a.bigInteger)
        .divide(new java.math.BigDecimal(b.bigInteger), 0,
          java.math.RoundingMode.HALF_UP).toBigIntegerExact)
      graft.operators.Learn.rhu(a, b) == viaDecimal
    }, 60)
  }

  test("prop: count is invariant under repartitioning") {
    check(forAll(Gen.listOf(Gen.chooseNum(-1000L, 1000L)), Gen.chooseNum(1, 7)) {
      (xs, parts) =>
        val df = xs.toDF("x")
        df.count() == df.repartition(parts).count()
    }, 15)
  }

  test("prop: min <= avg <= max within every group") {
    check(forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(-1e6, 1e6)))) { rows =>
      val agg = rows.toDF("k", "v").groupBy("k")
        .agg(min("v").as("mn"), avg("v").as("av"), max("v").as("mx"))
        .collect()
      agg.forall(r => r.getDouble(1) <= r.getDouble(2) + 1e-9
        && r.getDouble(2) <= r.getDouble(3) + 1e-9)
    }, 15)
  }

  test("prop: top-k equals sorted prefix") {
    check(forAll(Gen.listOf(Gen.chooseNum(-1000, 1000)), Gen.chooseNum(1, 10)) {
      (xs, k) =>
        val got = xs.toDF("x").orderBy(desc("x"), asc("x"))
          .limit(k).collect().map(_.getInt(0)).toSeq
        got == xs.sorted(Ordering[Int].reverse).take(k)
    }, 15)
  }

  test("prop: exact dedup is idempotent and minimal") {
    check(forAll(Gen.listOf(Gen.oneOf("x", "y", "z", "w"))) { xs =>
      val df = xs.toDF("t")
      val once = df.dropDuplicates("t")
      once.count() == once.dropDuplicates("t").count() &&
        once.count() == xs.distinct.size
    }, 15)
  }

  test("prop: fingerprint is a pure function and order-sensitive") {
    check(forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      (PolyFingerprint.hash(a) == PolyFingerprint.hash(a)) &&
        (a == b || a.length != b.length ||
          PolyFingerprint.hash(a + b) == PolyFingerprint.hash(a + b))
    }, 50)
  }

  test("prop: shingle count is max(words - 2, 0) for duplicate-free docs") {
    check(forAll(Gen.chooseNum(0, 30)) { n =>
      // distinct words => shingles are all distinct
      val text = (0 until n).map(i => s"w$i").mkString(" ")
      val got = Seq(text).toDF("text")
        .select(size(Dedup.shingleArray(col("text"))))
        .collect()(0).getInt(0)
      got == math.max(n - 2, 0)
    }, 20)
  }

  test("prop: salted aggregation equals direct aggregation") {
    check(forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("h", "i"), Gen.chooseNum(-100.0, 100.0)))) { rows =>
      val df = rows.toDF("k", "v")
      val direct = df.groupBy("k").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val salted = Skew.skewedSumCount(df, "k", "v").collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      direct == salted
    }, 10)
  }

  test("prop: text cleaning is idempotent") {
    val cleanExpr = (c: org.apache.spark.sql.Column) =>
      lower(trim(regexp_replace(regexp_replace(c, "<[^>]*>", " "), "\\s+", " ")))
    check(forAll(Gen.listOfN(20,
      Gen.oneOf("a <b>B</b>  c", "  x\t\ty <i>", "plain", "<p>A</p>\n<p>B</p>", ""))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val once = df.select(col("id"), cleanExpr(col("t")).as("c"))
      val twice = once.select(col("id"), cleanExpr(col("c")).as("c"))
      once.collect().toSeq.map(_.toString) == twice.collect().toSeq.map(_.toString)
    }, 5)
  }

  test("prop: redaction leaves no residual emails and split is total + deterministic") {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val redacted = graft.operators.TextAnalysis.redactPii(spark, sf).collect()
    redacted.foreach { r =>
      assert(!r.getString(1).matches(s".*$emailRe.*"), s"residual email: ${r.getString(1).take(80)}")
    }
    val a = graft.operators.TextAnalysis.hashSplit(spark, sf).collect().map(_.toString).toSeq
    val b = graft.operators.TextAnalysis.hashSplit(spark, sf).collect().map(_.toString).toSeq
    assert(a == b, "hash split must be run-deterministic")
    val counts = graft.operators.TextAnalysis.hashSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == 500, s"split must be total: $counts")
    assert(counts("train") > counts("val") && counts("train") > counts("test"),
      s"12/2/2 hex buckets => train dominates: $counts")
  }

  test("prop: sorted-intersect kernel equals set intersection on random sorted arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    check(forAll(Gen.listOf(Gen.chooseNum(0L, 50L)), Gen.listOf(Gen.chooseNum(0L, 50L))) {
      (a, b) =>
        val (sa, sb) = (a.distinct.sorted, b.distinct.sorted)
        graft.functions.SortedIntersectKernel.count(
          new GenericArrayData(sa.toArray), new GenericArrayData(sb.toArray)) ==
          sa.toSet.intersect(sb.toSet).size.toLong
    })
  }

  test("prop: deflate kernel matches java.util.zip and never exceeds input + overhead") {
    import org.apache.spark.unsafe.types.UTF8String
    def ref(s: String): Long = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
      try {
        d.setInput(s.getBytes("UTF-8")); d.finish()
        val buf = new Array[Byte](8192); var t = 0L
        while (!d.finished()) t += d.deflate(buf)
        t
      } finally d.end()
    }
    check(forAll(Gen.asciiPrintableStr) { s =>
      val k = graft.functions.DeflateKernel.deflatedSize(UTF8String.fromString(s))
      k == ref(s) && k <= s.getBytes("UTF-8").length + 16
    })
  }

  test("prop: segment dedup on random corpora — totality, keep-first, no kept duplicates") {
    val wordGen = Gen.oneOf("a", "b", "c", "d")
    val docGen = Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, wordGen))
    check(forAll(Gen.nonEmptyListOf(docGen)) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
      val dir = tmpDir("prop_segdedup")
      df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = Dedup.segmentDedup(spark, dir, segLen = 4).collect()
      val ok = out.length == docs.length &&                       // total
        out.forall(r => r.getLong(2) <= r.getLong(1)) && {        // kept <= segs
          // no 4-token segment survives twice corpus-wide
          val kept = out.flatMap(_.getString(3).split(" ").grouped(4).map(_.mkString(" ")))
            .filter(_.nonEmpty)
          kept.distinct.length == kept.length
        }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      ok
    }, 10)
  }

  test("prop: sequence packing offsets are the prefix sum for any doc-id spacing") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(1, 30))
    check(forAll(gen) { lens =>
      // non-contiguous, gapped doc_ids (block logic must not assume density)
      val df = lens.zipWithIndex
        .map { case (n, i) => (i.toLong * 7 + 3, List.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val dir = tmpDir("prop_pack")
      df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = graft.operators.Packing.chunkedTokenStream(spark, dir, ctx = 16, blockSize = 4)
        .orderBy("doc_id").collect()
      var acc = 0L
      val ok = out.forall { r =>
        val good = r.getLong(2) == acc; acc += r.getLong(1); good
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      ok
    }, 10)
  }

  test("random projection roughly preserves pairwise distances (JL) and is deterministic") {
    val proj = graft.operators.VectorOps.randomProjection(spark, sf)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2))).toMap
    val orig = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toArray.sorted.take(40)
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.length; if j <= i + 3
      o = d2(orig(ids(i)), orig(ids(j))); if o > 1e-9
    } yield d2(proj(ids(i)).toArray, proj(ids(j)).toArray) / o
    // k=16 is coarse (eps ~ 0.5); the MEDIAN distortion must still sit
    // near 1 if the signs are unbiased and the 1/sqrt(k) scale is right
    val med = ratios.sorted.apply(ratios.length / 2)
    assert(med > 0.5 && med < 2.0, s"median distortion $med over ${ratios.length} pairs")
    // deterministic: second run bit-identical
    val again = graft.operators.VectorOps.randomProjection(spark, sf)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2))).toMap
    assert(ids.forall(id => proj(id).sameElements(again(id))))
  }

  test("prop: jaro-winkler bounds, identity, and symmetry") {
    import org.apache.spark.unsafe.types.UTF8String
    def k(a: String, b: String): Double =
      graft.functions.StringKernels.jaroWinkler(
        UTF8String.fromString(a), UTF8String.fromString(b))
    val sGen = Gen.listOfN(8, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString.trim)
    check(forAll(sGen, sGen) { (a, b) =>
      val j = k(a, b)
      j >= 0.0 && j <= 1.0 && j == k(b, a) &&
        (a.isEmpty || k(a, a) == 1.0)
    }, 50)
  }
}
