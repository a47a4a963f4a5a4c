package graft

import org.apache.spark.sql.functions._
import graft.operators.Ingest
import graft.sources.FormatIO

class FormatIOSpec extends SparkSpec {
  import spark.implicits._

  test("every format round-trips the events table losslessly") {
    val src = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val expected = src.orderBy("event_id").collect().map(_.toString).toSeq
    FormatIO.Formats.foreach { fmt =>
      val path = tmpDir(s"fmt_${fmt}_") + "/t"
      FormatIO.write(src, fmt, path)
      val back = FormatIO.read(spark, fmt, path, src.schema)
      val got = back.orderBy("event_id").collect().map(_.toString).toSeq
      assert(got == expected, s"$fmt round-trip mismatch")
    }
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    val dir = tmpDir("evolve_") + "/t"
    Seq((1L, "a")).toDF("id", "x").write.mode("append").parquet(dir)
    Seq((2L, 9.9)).toDF("id", "y").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "x", "y"))
    assert(merged.count() == 2)
    val r1 = merged.filter(col("id") === 1).collect()(0)
    assert(r1.getAs[String]("x") == "a" && r1.isNullAt(merged.columns.indexOf("y")))
  }

  test("upsert: updates win on key collision, unmatched rows survive") {
    val existing = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("k", "v")
    val updates = Seq((2L, "new2"), (4L, "new4")).toDF("k", "v")
    val merged = Ingest.upsert(existing, updates, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged == Map(1L -> "old1", 2L -> "new2", 3L -> "old3", 4L -> "new4"))
  }

  test("compaction collapses file count without touching content") {
    val root = java.nio.file.Files.createTempDirectory("graft_test_k6_").toString
    try {
      val src = (1L to 10000L).map(i => (i, s"v$i")).toDF("k", "v")
      src.repartition(25).write.parquet(root + "/frag")
      val frag = spark.read.parquet(root + "/frag")
      def parquetFiles(p: String) = new java.io.File(p).listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(parquetFiles(root + "/frag") == 25)
      Ingest.compact(frag, root + "/compact", targetRowsPerFile = 4000)
      assert(parquetFiles(root + "/compact") == 3) // ceil(10000/4000)
      val back = spark.read.parquet(root + "/compact")
      assert(back.count() == 10000)
      assert(back.orderBy("k").collect().map(_.getLong(0)).toSeq == (1L to 10000L))
    } finally TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("upsert is idempotent: re-applying the same updates is a no-op") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val updates = Seq((2L, "b2")).toDF("k", "v")
    val once = Ingest.upsert(existing, updates, "k")
    val twice = Ingest.upsert(once, updates, "k")
    assert(once.collect().map(_.toString).sorted.toSeq ==
      twice.collect().map(_.toString).sorted.toSeq)
  }
}
