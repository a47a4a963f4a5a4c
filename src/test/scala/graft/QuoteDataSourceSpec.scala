package graft

import org.apache.spark.sql.functions._
import graft.sources.SyntheticQuoteSource

class QuoteDataSourceSpec extends SparkSpec {

  private val symbols = Seq("XT", "SCHX", "IXJ", "WCLD")

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
