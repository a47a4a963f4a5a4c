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
}
