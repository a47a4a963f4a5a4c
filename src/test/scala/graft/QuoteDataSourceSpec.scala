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
}
