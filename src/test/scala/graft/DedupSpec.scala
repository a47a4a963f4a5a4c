package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup collapses identical bodies to min doc_id") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "unique text here"), (7L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("t")
    val out = df.select(sha2(col("text"), 256).as("text_sha"), col("doc_id"))
      .groupBy("text_sha")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 3L, 3L -> 1L))
  }

  test("shingleArray: short docs produce no shingles; shingles are distinct") {
    val rows = Seq((1L, "one two"), (2L, "a b c d"), (3L, "x y z x y z"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingleArray(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L).isEmpty)
    assert(rows(2L) == Seq("a b c", "b c d"))
    assert(rows(3L).sorted == Seq("x y z", "y z x", "z x y").sorted,
      "duplicate shingle 'x y z' must appear once")
  }

  test("minhash LSH pairs equal exact jaccard pairs at the same threshold") {
    val lsh = Dedup.minhashLshPairs(spark, sf, 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Dedup.jaccardPairs(spark, sf, 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact, "LSH candidates + exact confirm must equal brute force")
    assert(exact.nonEmpty, "test corpus has planted near-duplicates")
  }

  test("simhash: identical docs collide at distance 0; planted dups are close") {
    val pairs = Dedup.simhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Dedup.jaccardPairs(spark, sf, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.nonEmpty)
    val recall = planted.intersect(pairs).size.toDouble / planted.size
    assert(recall >= 0.9, s"simhash should find J>=0.9 dups, recall=$recall")
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val pairs = Dedup.embeddingDupPairs(spark, sf, 0.4).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }
}
