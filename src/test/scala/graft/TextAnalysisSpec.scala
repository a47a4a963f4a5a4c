package graft

import org.apache.spark.sql.functions._
import graft.functions.PolyFingerprint
import graft.operators.{Multimodal, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("poly fingerprint expression matches the reference Scala fold") {
    val texts = Seq("hello world", "", "a", "the quick brown fox")
    val got = texts.toDF("text")
      .select(PolyFingerprint.fingerprint(col("text")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == texts.map(PolyFingerprint.hash))
  }

  test("fingerprint distinguishes different docs and is order-sensitive") {
    assert(PolyFingerprint.hash("ab") != PolyFingerprint.hash("ba"))
    assert(PolyFingerprint.hash("") == 0L)
  }

  test("token stats: words <= tokens, chars measured correctly") {
    val rows = TextAnalysis.tokenStats(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "subword tokens >= whitespace words")
      assert(r.getLong(3) > 0)
    }
  }

  test("quality score is bounded in [0,1]") {
    val rows = TextAnalysis.qualityScore(spark, sf).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0, s"quality out of range: $r")
    }
  }

  test("ngram langid is deterministic and total") {
    val a = TextAnalysis.langIdNgram(spark, sf).collect().map(r => (r.getLong(0), r.getString(1)))
    val b = TextAnalysis.langIdNgram(spark, sf).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq == b.toSeq)
    assert(a.length == 500)
    assert(a.forall { case (_, l) => (TextAnalysis.DefaultTrigramProfiles.keySet + "und").contains(l) })
  }

  test("winnowing guarantee: docs sharing a w+k-1 word run share a fingerprint") {
    import org.apache.spark.sql.functions._
    // w=4 windows over 3-gram hashes: any shared run of 4+3-1 = 6 words
    // spans a full window of shared grams, so its minimum is selected
    // in both documents.
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two $shared three four five six seven"),
      (2L, s"nine ten eleven twelve $shared thirteen fourteen"),
      (3L, "completely different words with no overlap at all here"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.words(col("text")).as("ws"))
    val fps = TextAnalysis.winnowFrom(docs)
      .select(col("doc_id"), col("fps"), size(col("ws")).as("n_words"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1).toSet, r.getInt(2))))
      .toMap
    assert((fps(1L)._1 intersect fps(2L)._1).nonEmpty,
      "shared 6-word run must contribute a common fingerprint")
    assert((fps(1L)._1 intersect fps(3L)._1).isEmpty,
      "disjoint vocabularies must not collide")
    // Density: winnowing must select strictly fewer than all gram positions.
    assert(fps(1L)._1.size < fps(1L)._2 - 2,
      "winnowing must be sparser than full shingling")
  }

  test("multimodal: magic-byte sniffing recognizes media headers") {
    assert(Multimodal.sniffKind(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)) == "jpeg")
    assert(Multimodal.sniffKind(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)) == "png")
    assert(Multimodal.sniffKind("RIFFxxxx".getBytes) == "riff")
    assert(Multimodal.sniffKind("plain text".getBytes) == "bin")
  }

  test("multimodal feature extraction is deterministic per payload") {
    val a = Multimodal.extractFeatures(spark, sf).collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(spark, sf).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(f => f.n_bytes > 0 && f.width > 0 && f.height > 0))
  }

  test("header parser reads real PNG IHDR and JPEG SOF0 dimensions") {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 0x0d, 'I', 'H', 'D', 'R').map(_.toByte) ++
      be32(640) ++ be32(480) ++ Array[Byte](8, 6, 0, 0, 0)
    assert(Multimodal.HeaderParser.dims(png).contains((640, 480)))

    // FFD8, APP0 (16 bytes), then SOF0 with precision 8, h=333, w=517.
    val jpeg = Array(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 2, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xc0, 0x00, 0x11, 0x08, 333 >> 8, 333 & 0xff, 517 >> 8, 517 & 0xff,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte)
    assert(Multimodal.HeaderParser.dims(jpeg).contains((517, 333)))
    // TEM (0xFF01) is standalone — must be stepped over, not read as a
    // length-bearing segment; EOI before any SOF terminates the walk.
    val withTem = jpeg.take(2) ++ Array(0xff.toByte, 0x01.toByte) ++ jpeg.drop(2)
    assert(Multimodal.HeaderParser.dims(withTem).contains((517, 333)))
    val eoiOnly = Array(0xff, 0xd8, 0xff, 0xd9, 0xff, 0xc0, 0x00, 0x11).map(_.toByte)
    assert(Multimodal.HeaderParser.jpegDims(eoiOnly).isEmpty)
    // Non-image payloads fall through to None (FakeDecoder pseudo-dims).
    assert(Multimodal.HeaderParser.dims("not an image".getBytes).isEmpty)
    // Decoder integration: planted dims win over the fake hash dims.
    val f = Multimodal.FakeDecoder.decode(1L, png)
    assert(f.width == 640 && f.height == 480 && f.kind == "png")
  }

  test("ImageIO decoder recovers exact planted pixel statistics from a real PNG") {
    val id = 137L
    val p = Multimodal.PlantedImage(id)
    val stats = Multimodal.ImageIODecoder.decode(Multimodal.encodePlantedPng(id)).get
    assert(stats.width == p.width && stats.height == p.height && stats.n_channels == 3)
    val n = p.width.toLong * p.height
    def mean(a: Int, b: Int): Double =
      (p.height.toLong * (p.wLeft.toLong * a + (p.width - p.wLeft).toLong * b)).toDouble / n
    assert(stats.mean_r == mean(p.rA, p.rB))
    assert(stats.mean_g == mean(p.gA, p.gB))
    assert(stats.mean_b == mean(p.bA, p.bB))
    // Non-image payload → None (the hybrid decoder falls back to fake).
    assert(Multimodal.ImageIODecoder.decode("not an image".getBytes).isEmpty)
  }

  test("m9 resize: NN 4x4 thumbnail means match the planted-raster replay") {
    val rows = graft.operators.Multimodal.resizeStats(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(rows.length == docs)
    rows.take(20).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val p = graft.operators.Multimodal.PlantedImage(id)
      // NN sampling: column x' reads src column (x'*w)/4 — left tone iff < wLeft
      val na = (0 until 4).count(x => x * p.width / 4 < p.wLeft)
      def mean(a: Int, b: Int): Double = (na * a + (4 - na) * b) / 4.0
      assert(r.getAs[Double]("mean_r4") == mean(p.rA, p.rB), s"doc $id red")
      assert(r.getAs[Double]("mean_g4") == mean(p.gA, p.gB), s"doc $id green")
      assert(r.getAs[Double]("mean_b4") == mean(p.bA, p.bB), s"doc $id blue")
    }
  }

  test("hybrid decoder uses real decoded dims for decodable images") {
    val bytes = Multimodal.encodePlantedPng(42L)
    val p = Multimodal.PlantedImage(42L)
    val f = Multimodal.HybridDecoder.decode(42L, bytes)
    assert(f.width == p.width && f.height == p.height && f.kind == "png")
  }

  test("javax.sound decoder recovers exact planted PCM statistics from a real WAV") {
    val id = 261L
    val p = Multimodal.PlantedAudio(id)
    val s = Multimodal.WavDecoder.decode(Multimodal.encodePlantedWav(id))
    assert(s.nSamples == p.nSamples && s.sampleRate == p.sampleRate)
    val samples = (0 until p.nSamples).map(p.sample)
    assert(s.sumAbs == samples.map(v => math.abs(v).toLong).sum)
    assert(s.peakAbs == samples.map(math.abs).max)
  }

  test("wav header parser reads fmt chunk through an interposed chunk") {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // RIFF/WAVE with a JUNK chunk (odd size → word alignment) before fmt.
    val junk = "JUNK".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0)
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(48000) ++
      le32(48000 * 2 * 2) ++ le16(4) ++ le16(16)
    val wav = "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++ junk ++ fmt
    assert(Multimodal.HeaderParser.wavInfo(wav).contains((2, 48000)))
    assert(Multimodal.HeaderParser.wavInfo("RIFFxxxxAVI ".getBytes).isEmpty)
  }

  test("wav header roundtrip recovers planted audio params") {
    val out = Multimodal.wavHeaderRoundtrip(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 2 + 1).toInt)
      val want = (id % 3) match { case 0 => 44100; case 1 => 22050; case _ => 16000 }
      assert(r.getInt(2) == want)
    }
  }

  test("png header roundtrip recovers planted dims on the binary column") {
    val out = Multimodal.pngHeaderRoundtrip(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 1920 + 1).toInt && r.getInt(2) == (id % 1080 + 1).toInt)
    }
  }

  test("audio windows partition the PCM stream exactly") {
    val out = Multimodal.audioWindowStats(spark, sf).collect()
    val perDoc = out.groupBy(_.getLong(0))
    assert(perDoc.size == 500)
    perDoc.foreach { case (id, ws) =>
      val expected = (id % 50 + 10).toInt
      assert(ws.map(_.getLong(2)).sum == expected)        // windows cover all samples
      assert(ws.map(_.getInt(1)).sorted.toSeq == (0 until ws.length))
      // all full windows are 16 samples; only the last may be partial
      val sorted = ws.sortBy(_.getInt(1))
      assert(sorted.dropRight(1).forall(_.getLong(2) == 16))
    }
    // exact per-window recompute for one doc from the planted formula
    val id = 7L
    val n = (id % 50 + 10).toInt
    val samples = (0 until n).map(i => math.abs(((id * 31 + i * 17) % 2003 - 1001).toInt))
    val want = samples.grouped(16).map(_.sum.toLong).toSeq
    val got = out.filter(_.getLong(0) == id).sortBy(_.getInt(1)).map(_.getLong(3)).toSeq
    assert(got == want)
  }

  test("frame sampling decodes every 2nd planted frame with exact sampled-pixel means") {
    val out = Multimodal.frameSampleStats(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      val nf = Multimodal.plantedFrameCount(id)
      assert(r.getInt(1) == nf)
      assert(r.getLong(2) == (nf + 1) / 2)             // frames 0,2,4,...
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 255.0)
    }
    // cross-check one doc against a local re-decode of its sampled frames
    val id = 5L
    val sums = (0 until Multimodal.plantedFrameCount(id) by 2).map { f =>
      Multimodal.ImageIODecoder
        .decodeSums(Multimodal.encodePlantedPng(Multimodal.plantedFrameSeed(id, f))).get
    }
    val np = sums.map(s => s._1.toLong * s._2).sum
    // mirror Spark's round(): decimal-string HALF_UP, not rint
    val wantR = java.math.BigDecimal.valueOf(sums.map(_._3).sum.toDouble / np)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val got = out.find(_.getLong(0) == id).get
    assert(got.getDouble(3) == wantR)
  }

  test("phrase search: every hit has the phrase verbatim at start_pos") {
    val phrase = "part filter scan".split(" ")
    val hits = TextAnalysis.phraseSearch(spark, sf).collect()
    assert(hits.nonEmpty)
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+")).toMap
    hits.foreach { h =>
      val ws = texts(h.getAs[Long]("doc_id"))
      val p = h.getAs[Long]("start_pos").toInt
      assert(ws.slice(p, p + phrase.length).sameElements(phrase),
        s"phrase mismatch at doc ${h.getAs[Long]("doc_id")} pos $p")
    }
  }

  test("deflate kernel: exact vs java.util.zip, and ratio separates repetition from noise") {
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
    val rep = "spam ham " * 500
    val rng = new scala.util.Random(7)
    val noise = Array.fill(4000)((rng.nextInt(94) + 33).toChar).mkString
    for (s <- Seq(rep, noise, "", "a", "héllo wörld")) {
      assert(graft.functions.DeflateKernel.deflatedSize(UTF8String.fromString(s)) == ref(s),
        s"kernel diverges from java.util.zip for ${s.take(20)}")
    }
    assert(ref(rep).toDouble / rep.getBytes("UTF-8").length < 0.05,
      "repetitive text must compress hard")
    assert(ref(noise).toDouble / noise.getBytes("UTF-8").length > 0.7,
      "random noise must not compress")
  }

  test("compression profile: per-lang rows cover the corpus, ratios in (0,1]") {
    val rows = graft.operators.TextAnalysis.compressionProfile(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      val (lo, av, hi) = (r.getAs[Double]("min_ratio"),
        r.getAs[Double]("avg_ratio"), r.getAs[Double]("max_ratio"))
      assert(lo > 0 && lo <= av && av <= hi, s"ratio ordering broken: $r")
      assert(hi <= 1.2, s"deflate overhead beyond plausible bound: $r")
      assert(r.getAs[Long]("n_repetitive") <= r.getAs[Long]("n_docs"))
    }
  }

  test("repeated spans: islands are maximal, in bounds, and genuinely repeated") {
    val n = 5
    val spans = graft.operators.Dedup.repeatedSpans(spark, sf).collect()
    assert(spans.nonEmpty)
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+")).toMap
    spans.foreach { s =>
      val start = s.getAs[Long]("span_start")
      val end = s.getAs[Long]("span_end")
      val grams = s.getAs[Long]("n_grams")
      assert(grams == end - start - n + 2, s"island arithmetic broken: $s")
      assert(end < texts(s.getAs[Long]("doc_id")).length,
        s"span exceeds doc bounds: $s")
    }
    // each span's covered text must appear in at least one OTHER doc
    spans.take(10).foreach { s =>
      val ws = texts(s.getAs[Long]("doc_id"))
      val frag = ws.slice(s.getAs[Long]("span_start").toInt,
        s.getAs[Long]("span_start").toInt + n).mkString(" ")
      val holders = texts.count { case (_, w) =>
        w.sliding(n).exists(_.mkString(" ") == frag) }
      assert(holders >= 2, s"span fragment '$frag' not repeated across docs")
    }
  }
}
