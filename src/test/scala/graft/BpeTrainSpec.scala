package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class BpeTrainSpec extends SparkSpec {

  test("bpe training: 3 ordered steps with positive, non-increasing merge counts") {
    val rows = TextAnalysis.bpeTrain(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("step")).toSeq == Seq(1, 2, 3))
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.forall(_ > 0))
    // greedy BPE invariant: a later merge can never beat an earlier argmax
    assert(ns.toSeq.sliding(2).forall(w => w.head >= w.last))
  }

  test("bpe step 1 equals the independent corpus-wide top adjacent pair") {
    val expected = Tables.documents(spark, sf)
      .select(TextAnalysis.words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ws")) - lit(2)),
        i => struct(element_at(col("ws"), i + lit(1)).as("w1"),
          element_at(col("ws"), i + lit(2)).as("w2")))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("w1"), asc("w2")).limit(1).head()
    val got = TextAnalysis.bpeTrain(spark, sf).collect().head
    assert(got.getAs[String]("w1") == expected.getString(0))
    assert(got.getAs[String]("w2") == expected.getString(1))
    assert(got.getAs[Long]("n") == expected.getLong(2))
  }

  test("bpe merges are deterministic across invocations") {
    val a = TextAnalysis.bpeTrain(spark, sf).collect().toSeq
    val b = TextAnalysis.bpeTrain(spark, sf).collect().toSeq
    assert(a == b)
  }
}
