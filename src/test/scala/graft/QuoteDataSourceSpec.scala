package graft

import org.apache.spark.sql.functions._
import graft.sources.SyntheticQuoteSource

class QuoteDataSourceSpec extends SparkSpec {

  private val symbols = Seq("XT", "SCHX", "IXJ", "WCLD")

  test("DSv2 sink: append accumulates, overwrite truncates, staging is swept") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_test_k7_").toString
    try {
      val out = s"$root/out"
      val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c,not", 3.5)).toDF("k", "s", "v")
        .filter(col("s") =!= "c,not") // sink contract: no delimiter in strings
      def writeOnce(mode: String): Unit =
        df.write.format("graft.sources.v2.LocalFileSink")
          .option("path", out).mode(mode).save()
      val schema = "k LONG, s STRING, v DOUBLE"
      writeOnce("append")
      assert(spark.read.schema(schema).csv(out).count() == 2)
      writeOnce("append")
      assert(spark.read.schema(schema).csv(out).count() == 4)
      writeOnce("overwrite") // -> SupportsTruncate
      val back = spark.read.schema(schema).csv(out)
      assert(back.count() == 2)
      assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
        == Set((1L, "a", 1.5), (2L, "b", 2.5)))
      // Exactly-once publish hygiene: no staging residue after commit.
      assert(!new java.io.File(s"$out/_staging").exists())
    } finally TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("DSv2 source loads via spark.read.format with one partition per symbol") {
    val df = spark.read.format("graft.sources.v2.QuoteDataSource")
      .option("symbols", symbols.mkString(","))
      .load()
    assert(df.rdd.getNumPartitions == symbols.length,
      "fan-out contract: one input partition per symbol")
    assert(df.count() == 4)
    assert(df.select("symbol").collect().map(_.getString(0)).sorted.toSeq ==
      symbols.sorted)
  }

  test("DSv2 rows equal the Dataset provider's rows (shared generator)") {
    val v2 = spark.read.format("graft.sources.v2.QuoteDataSource")
      .option("symbols", symbols.mkString(",")).option("seed", "42")
      .load().orderBy("symbol").collect().map(_.toString).toSeq
    val ds = new SyntheticQuoteSource(42L).fetch(spark, symbols)
      .toDF().orderBy("symbol").collect().map(_.toString).toSeq
    assert(v2 == ds)
  }

  test("DSv2 source supports projection in the plan") {
    val df = spark.read.format("graft.sources.v2.QuoteDataSource")
      .option("symbols", "XT").load()
      .select(col("symbol"), col("market_price"))
    assert(df.columns.toSeq == Seq("symbol", "market_price"))
    val r = df.collect()(0)
    assert(r.getString(0) == "XT" && r.getDouble(1) > 0)
  }

  test("DSv2 column pruning reaches the scan (ReadSchema is the projection)") {
    val df = spark.read.format("graft.sources.v2.QuoteDataSource")
      .option("symbols", symbols.mkString(",")).load()
      .select(col("symbol"), col("market_price"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("symbol") && scan.contains("market_price")
      && !scan.contains("day_high"),
      s"scan must read only the projected columns:\n$scan")
    assert(df.collect().length == symbols.length)
  }

  test("DSv2 symbol predicate prunes the fetch fan-out to one partition") {
    val df = spark.read.format("graft.sources.v2.QuoteDataSource")
      .option("symbols", symbols.mkString(",")).load()
      .filter(col("symbol") === "XT")
    assert(df.rdd.getNumPartitions == 1,
      "symbol = 'XT' must plan exactly one InputPartition (no fetch for the rest)")
    assert(df.collect().map(_.getString(2)).toSeq == Seq("XT"))
    val in = spark.read.format("graft.sources.v2.QuoteDataSource")
      .option("symbols", symbols.mkString(",")).load()
      .filter(col("symbol").isin("XT", "IXJ"))
    assert(in.rdd.getNumPartitions == 2)
    assert(in.select("symbol").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("IXJ", "XT"))
  }

  test("DSv2 fails fast on a missing symbols option") {
    intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.v2.QuoteDataSource").load().collect()
    }
  }
}
