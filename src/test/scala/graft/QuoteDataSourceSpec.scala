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

  test("DSv2 complete aggregate pushdown answers COUNT/MIN/MAX with zero fetches") {
    val before = graft.sources.QuoteGen.fetches.get()
    val df = spark.read.format("graft.sources.v2.QuoteDataSource")
      .option("symbols", symbols.mkString(",")).load()
      .agg(count(lit(1)).as("n"), min("symbol").as("lo"), max("symbol").as("hi"))
    val r = df.collect()(0)
    assert((r.getLong(0), r.getString(1), r.getString(2)) == (4L, "IXJ", "XT"))
    assert(graft.sources.QuoteGen.fetches.get() == before,
      "a completely-pushed aggregate must not fetch any quote")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("QuoteAggScan") || !plan.contains("HashAggregate"),
      s"aggregate must be answered by the scan, not re-aggregated:\n$plan")
  }

  test("DSv2 GROUP BY symbol aggregate pushdown: per-symbol counts, zero fetches") {
    val before = graft.sources.QuoteGen.fetches.get()
    val rows = spark.read.format("graft.sources.v2.QuoteDataSource")
      .option("symbols", symbols.mkString(",")).load()
      .groupBy(col("symbol")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == symbols.map(_ -> 1L).toMap)
    assert(graft.sources.QuoteGen.fetches.get() == before,
      "grouped counts must come from the universe, not fetches")
  }

  test("DSv2 aggregate pushdown refuses shapes it cannot answer (still correct)") {
    val before = graft.sources.QuoteGen.fetches.get()
    // avg(market_price) needs real quotes: connector must refuse the
    // push and the normal fetch+aggregate path must produce the value.
    val df = spark.read.format("graft.sources.v2.QuoteDataSource")
      .option("symbols", symbols.mkString(",")).load()
      .agg(avg("market_price").as("m"))
    assert(df.collect()(0).getDouble(0) > 0)
    assert(graft.sources.QuoteGen.fetches.get() == before + symbols.length)
  }

  test("DSv2 top-N pushdown fetches only the winning symbols") {
    val before = graft.sources.QuoteGen.fetches.get()
    val df = spark.read.format("graft.sources.v2.QuoteDataSource")
      .option("symbols", symbols.mkString(",")).load()
      .orderBy(col("symbol")).limit(2).select(col("symbol"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("IXJ", "SCHX"))
    assert(graft.sources.QuoteGen.fetches.get() == before + 2,
      "ORDER BY symbol LIMIT 2 must fetch exactly 2 of 4 symbols")
  }

  test("DSv2 limit pushdown prunes the fan-out") {
    val before = graft.sources.QuoteGen.fetches.get()
    val df = spark.read.format("graft.sources.v2.QuoteDataSource")
      .option("symbols", symbols.mkString(",")).load()
      .limit(3)
    assert(df.count() == 3)
    assert(graft.sources.QuoteGen.fetches.get() - before <= 3,
      "LIMIT 3 must plan at most 3 of 4 symbol fetches")
  }

  test("DSv2 runtime filtering prunes the fetch fan-out to the join's key set") {
    import spark.implicits._
    val universe = ('a' to 'z').map(c => s"SY$c") // 26 symbols
    // DPP fires only for a dim side with a selective predicate that
    // SURVIVES optimization — a filtered LocalRelation constant-folds
    // away, so stage the dim through parquet like a real dimension.
    val root = java.nio.file.Files.createTempDirectory("graft_test_dpp_").toString
    try {
      universe.toDF("sym").write.parquet(s"$root/dim")
      val dim = spark.read.parquet(s"$root/dim")
        .filter(col("sym").isin("SYa", "SYm", "SYz"))
      val before = graft.sources.QuoteGen.fetches.get()
      val got = spark.read.format("graft.sources.v2.QuoteDataSource")
        .option("symbols", universe.mkString(",")).load()
        .join(broadcast(dim), col("symbol") === col("sym"))
        .select(col("symbol")).collect().map(_.getString(0)).sorted.toSeq
      assert(got == Seq("SYa", "SYm", "SYz"))
      val fetched = graft.sources.QuoteGen.fetches.get() - before
      assert(fetched <= 3,
        s"runtime filter must prune the fetch fan-out to the 3 join keys, fetched $fetched")
    } finally TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("DSv2 micro-batch source: checkpointed offsets resume exactly once") {
    val root = java.nio.file.Files.createTempDirectory("graft_test_st13_").toString
    try {
      def run(rounds: Int): Unit = {
        val q = spark.readStream.format("graft.sources.v2.QuoteDataSource")
          .option("symbols", symbols.mkString(",")).option("rounds", rounds.toString)
          .load()
          .select(col("symbol"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(s"$root/out")
          }
          .start()
        q.awaitTermination(60000)
        assert(!q.isActive)
      }
      run(2) // rounds 0,1
      assert(spark.read.parquet(s"$root/out").count() == 2L * symbols.length)
      run(4) // resumes at committed offset 2 -> only rounds 2,3 are new
      val per = spark.read.parquet(s"$root/out")
        .groupBy("symbol").count().collect()
      assert(per.length == symbols.length)
      per.foreach(r => assert(r.getLong(1) == 4,
        s"symbol ${r.getString(0)} emitted ${r.getLong(1)} != 4 rows — offset resume broken"))
    } finally TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("DSv2 fails fast on a missing symbols option") {
    intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.v2.QuoteDataSource").load().collect()
    }
  }

  test("DSv2 reported partitioning: groupBy(symbol) plans ZERO exchanges") {
    val saved = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val many = ('a' to 'z').map(c => s"SYM_$c")
      val df = spark.read.format("graft.sources.v2.QuoteDataSource")
        .option("symbols", many.mkString(",")).load()
        .groupBy(col("symbol"))
        .agg(count(lit(1)).as("n_rows"),
          (min(col("market_price")) > 0).as("price_positive"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"KeyGroupedPartitioning not honored — plan still shuffles:\n${plan.take(1500)}")
      val rows = df.collect()
      assert(rows.length == many.length)
      rows.foreach { r =>
        assert(r.getAs[Long]("n_rows") == 1L)
        assert(r.getAs[Boolean]("price_positive"))
      }
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
    }
  }

  test("DSv2 storage-partitioned join: symbol equi-join plans zero exchanges") {
    val saved = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val many = ('a' to 'z').map(c => s"SYM_$c")
      def read(seed: Long) = spark.read
        .format("graft.sources.v2.QuoteDataSource")
        .option("symbols", many.mkString(",")).option("seed", seed.toString)
        .load().select(col("symbol"), col("market_price"))
      val j = read(1L).withColumnRenamed("market_price", "pa")
        .join(read(2L).withColumnRenamed("market_price", "pb"), Seq("symbol"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"SPJ did not fire — join still shuffles:\n${plan.take(1500)}")
      val rows = j.collect()
      assert(rows.length == many.length)
      rows.foreach(r => assert(r.getAs[Double]("pa") != r.getAs[Double]("pb")))
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
    }
  }

  test("DSv2 reported partitioning drops to unknown when symbol is pruned") {
    // A clustering key absent from the scan output must not be
    // reported; the plan shuffles as usual and stays correct.
    val df = spark.read.format("graft.sources.v2.QuoteDataSource")
      .option("symbols", symbols.mkString(",")).load()
      .groupBy(col("quote_type")).agg(count(lit(1)).as("n"))
    assert(df.collect().map(_.getAs[Long]("n")).sum == symbols.length)
  }
}
