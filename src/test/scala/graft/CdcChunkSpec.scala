package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{CdcBoundsExpr, CdcKernel}
import graft.operators.Dedup

/** Content-defined chunking: kernel vs a naive reference, the
  * shift-robustness property the operator exists for, and the gated
  * cdc1 report shape.
  */
class CdcChunkSpec extends SparkSpec {

  /** Naive reference: recompute every window-bag sum from scratch. */
  private def refBounds(s: String, w: Int = 16, d: Long = 64L): Seq[Long] = {
    val cps = s.codePoints().toArray
    (w to cps.length).filter { end =>
      val sum = cps.slice(end - w, end)
        .map(cp => (cp * 2654435761L) % 2147483647L).sum
      sum % d == 0L
    }.map(_.toLong)
  }

  private def chunksOf(s: String): Seq[String] = {
    val bs = CdcKernel.bounds(UTF8String.fromString(s), 16, 64L)
      .toLongArray().toSeq
    val cuts = 0L +: bs :+ s.codePointCount(0, s.length).toLong
    cuts.zip(cuts.tail).map { case (a, b) =>
      val from = s.offsetByCodePoints(0, a.toInt)
      val to = s.offsetByCodePoints(0, b.toInt)
      s.substring(from, to)
    }
  }

  test("kernel matches the from-scratch window-bag reference") {
    val rng = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val n = rng.nextInt(400)
      val s = (0 until n).map(_ => (32 + rng.nextInt(95)).toChar).mkString
      assert(CdcKernel.bounds(UTF8String.fromString(s), 16, 64L)
        .toLongArray().toSeq == refBounds(s), s"mismatch on ${s.take(40)}")
    }
  }

  test("supplementary code points count as one position each") {
    val s = "a😀bcdefghijklmnopqrs" // emoji = 1 code point
    val bs = CdcKernel.bounds(UTF8String.fromString(s), 16, 64L).toLongArray()
    val nCp = s.codePointCount(0, s.length)
    assert(bs.forall(b => b >= 16 && b <= nCp))
    assert(chunksOf(s).mkString == s) // chunks partition the text
  }

  test("shift robustness: a single insertion preserves distant chunks") {
    val rng = new scala.util.Random(11)
    val base = (0 until 4000).map(_ => (97 + rng.nextInt(26)).toChar).mkString
    val edited = base.substring(0, 2000) + "X" + base.substring(2000)
    val a = chunksOf(base)
    val b = chunksOf(edited)
    // Chunks are content-addressed: everything except the chunks
    // touching the edit point must reappear verbatim.
    val shared = a.toSet.intersect(b.toSet)
    val lost = a.toSet -- shared
    assert(a.size > 20, s"degenerate chunking: ${a.size} chunks")
    assert(lost.size <= 3,
      s"insertion invalidated ${lost.size} of ${a.size} chunks — not shift-robust")
  }

  test("fixed-size blocks are NOT shift-robust (the motivating contrast)") {
    val rng = new scala.util.Random(13)
    val base = (0 until 4000).map(_ => (97 + rng.nextInt(26)).toChar).mkString
    val edited = "X" + base // shift everything by one
    def blocks(s: String) = s.grouped(64).toSeq
    val sharedFixed = blocks(base).toSet.intersect(blocks(edited).toSet)
    val sharedCdc = chunksOf(base).toSet.intersect(chunksOf(edited).toSet)
    assert(sharedFixed.size <= 1, "fixed blocks unexpectedly survived a shift")
    assert(sharedCdc.size > chunksOf(base).size / 2,
      s"CDC should keep most chunks across a prefix shift, kept ${sharedCdc.size}")
  }

  test("cdc1 report: repeated chunks only, md5 keys, descending counts") {
    val rows = Dedup.chunkDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_occurrences") > 1)
      assert(r.getAs[Long]("n_docs") >= 1)
      assert(r.getAs[String]("chunk_md5").length == 32)
      assert(r.getAs[Long]("chunk_len") >= 32)
    }
    val occ = rows.map(_.getAs[Long]("n_occurrences")).toSeq
    assert(occ == occ.sortBy(-_))
  }

  test("cdc_bounds registered in the SQL function registry") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_bounds", GraftExtensions.functions.toMap.apply("cdc_bounds"), "built-in")
    val df = spark.sql(
      "SELECT cdc_bounds('abcdefghijklmnopqrstuvwxyz0123456789') AS b")
    val arr = df.collect()(0).getSeq[Long](0)
    assert(arr == refBounds("abcdefghijklmnopqrstuvwxyz0123456789"))
  }
}
