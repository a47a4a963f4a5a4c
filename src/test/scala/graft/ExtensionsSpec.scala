package graft

import org.apache.spark.sql.functions._
import graft.functions.PolyFingerprint
import graft.operators.Skew

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions are SQL-callable after registry injection") {
    // The withExtensions path only applies at session construction and
    // the suite shares one session — apply the extension to a real
    // SparkSessionExtensions instance to validate injection wiring,
    // then register the same builders on the live session's registry.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // Register the PRODUCTION builders (arity-checked) on the live session.
    GraftExtensions.functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    val fp = spark.sql("SELECT poly_fingerprint('hello world') AS fp")
      .collect()(0).getLong(0)
    assert(fp == PolyFingerprint.hash("hello world"))
    // Wrong arity fails analysis cleanly (WRONG_NUM_ARGS), never with an
    // IndexOutOfBoundsException from children(1).
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT jaro_winkler('only-one-arg')").collect()
    }
    assert(e.getMessage.contains("jaro_winkler"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product(array(1.0d))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT char_trigrams('a', 'b')").collect()
    }
    val dp = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(dp == 11.0)
    val tg = spark.sql("SELECT char_trigrams('abcdab') AS t")
      .collect()(0).getSeq[String](0)
    assert(tg == Seq("abc", "bcd", "cda", "dab"))
    assert(spark.sql("SELECT char_trigrams('ab') AS t")
      .collect()(0).getSeq[String](0).isEmpty)
    val jw = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS j")
      .collect()(0).getDouble(0)
    assert(jw == 0.9611111111111111)
    // Round-6 kernels: DEFLATE size, sorted intersection, SimHash.
    val dz = spark.sql("SELECT deflate_size('aaaaaaaaaaaaaaaaaaaa') AS z")
      .collect()(0).getLong(0)
    assert(dz > 0 && dz < 20, s"20 repeated bytes must deflate below input size, got $dz")
    val ic = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS c")
      .collect()(0).getLong(0)
    assert(ic == 2)
    val sh = spark.sql("SELECT simhash64(array(5L, 12L)) AS h").collect()(0).getLong(0)
    assert(sh == graft.functions.SimHashKernel.sig(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](5L, 12L))))
    val iw = spark.sql(
      "SELECT sorted_intersect_weight_sum(array(1L, 3L, 5L), array(3L, 4L, 5L), " +
        "array(10L, 20L, 30L)) AS s")
      .collect()(0).getLong(0)
    assert(iw == 50)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT deflate_size('a', 'b')").collect()
    }
  }

  test("sk3: AQE really splits the skewed partition (isSkew in the final plan)") {
    val confs = Seq(
      // sf0.001's hot partition is only tens of KB — scale thresholds
      // to the corpus so the split fires the way 256 MB does at 100 TB
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4096",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2048",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1024",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // AQE splits a skewed reduce partition at MAPPER-block
      // boundaries — a single-file corpus has one mapper, leaving
      // nothing to split. Fan the map side out first, as a real
      // multi-file table would be.
      val fact = Tables.lineitem(spark, sf).repartition(16)
        .select(when(col("l_orderkey") % 3 =!= 0, lit(0L))
            .otherwise(col("l_orderkey")).as("k"), col("l_extendedprice"))
      // dim WITHOUT distinct(): an aggregate between the Sort and the
      // shuffle stage breaks the rule's SMJ(Sort(stage), Sort(stage))
      // pattern; the payload column must survive pruning or the
      // all-zeros hot partition compresses below any threshold
      val dim = Tables.orders(spark, sf)
        .filter(col("o_orderkey") % 3 === 0 && col("o_orderkey") =!= 0)
        .select(col("o_orderkey").as("k"))
        .unionAll(spark.range(1).select(lit(0L).as("k")))
      val j = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew"),
        s"AQE skew split did not fire under scaled thresholds:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    // and the gated operator's result is threshold-independent
    val rows = Skew.aqeSkewJoin(spark, sf).collect()
    assert(rows.nonEmpty && rows.map(_.getAs[Long]("n_rows")).sum ==
      Tables.lineitem(spark, sf).count())
  }

  test("nfc kernel: composes decomposed sequences, ASCII fast path returns input") {
    import org.apache.spark.unsafe.types.UTF8String
    def n(s: String): String = graft.functions.NfcKernel.nfc(UTF8String.fromString(s)).toString
    assert(n("é") == "é")                     // e + combining acute -> é
    assert(n("abc") == "abc")
    val ascii = UTF8String.fromString("plain ascii")
    assert(graft.functions.NfcKernel.nfc(ascii) eq ascii) // no-alloc fast path
    val composed = UTF8String.fromString("café")
    assert(graft.functions.NfcKernel.nfc(composed) eq composed) // already-NFC fast path
    assert(n("Å") == "Å")                     // A + ring -> Å
    assert(n("") == "")
    // SQL surface (registered in the first test of this suite)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", GraftExtensions.functions.toMap.apply("nfc_normalize"), "built-in")
    // NB: Spark chr() is ASCII-mod-256, so chr(769) would be chr(1) —
    // embed the combining acute directly in the SQL text instead.
    val r = spark.sql("SELECT nfc_normalize('é') AS s, " +
      "length(nfc_normalize('é')) AS l").collect()(0)
    assert(r.getString(0) == "é" && r.getInt(1) == 1)
  }

  test("jaro-winkler kernel: classic values, edges, and boost gating") {
    import org.apache.spark.unsafe.types.UTF8String
    def k(a: String, b: String): Double =
      graft.functions.StringKernels.jaroWinkler(
        UTF8String.fromString(a), UTF8String.fromString(b))
    assert(k("martha", "marhta") == 0.9611111111111111)
    assert(k("dwayne", "duane") == 0.8400000000000001)
    assert(k("abc", "abc") == 1.0)
    assert(k("abc", "xyz") == 0.0)
    // DuckDB convention: any empty side scores 0 (fuzz-verified)
    assert(k("", "") == 0.0 && k("a", "") == 0.0)
    // below the 0.7 gate the prefix bonus must NOT apply
    assert(k("ab", "ax") == 2.0 / 3.0)
    // symmetric
    assert(k("jellyfish", "smellyfish") == k("smellyfish", "jellyfish"))
  }

  test("ac_count/ac_distinct are SQL-callable with a literal dictionary") {
    GraftExtensions.functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    val r = spark.sql(
      "SELECT ac_count('abcabc', 'ab,bc') AS n, ac_distinct('abcabc', 'ab,bc,zz') AS d")
      .head()
    assert(r.getLong(0) === 4L) // ab@0, bc@1, ab@3, bc@4 — overlaps counted
    assert(r.getLong(1) === 2L)
    // a non-literal dictionary is rejected at build time
    val e = intercept[Exception] {
      spark.sql("SELECT ac_count('x', concat('a', 'b' || rand())) ").collect()
    }
    assert(e.getMessage.contains("string literal"))
    // '\,' escapes a literal comma inside a pattern; '\\' a backslash
    val esc = spark.sql(
      """SELECT ac_count('a,b a,b', 'a\\,b') AS n,
        |  ac_count('x\\y', '\\\\') AS b""".stripMargin).head()
    assert(esc.getLong(0) === 2L)
    assert(esc.getLong(1) === 1L)
    // empty segments (trailing/doubled comma) are rejected, not dropped
    val e2 = intercept[Exception] {
      spark.sql("SELECT ac_count('x', 'a,,b')").collect()
    }
    assert(e2.getMessage.contains("empty pattern"))
    val e3 = intercept[Exception] {
      spark.sql("SELECT ac_count('x', 'a,b,')").collect()
    }
    assert(e3.getMessage.contains("empty pattern"))
  }

  test("salted join equals plain join on skewed data") {
    val left = (1 to 2000).map(i => (if (i % 10 == 0) 1L else i.toLong, i.toDouble))
      .toDF("k", "x") // key 1 is hot
    val right = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("rk", "name")
    val plain = left.join(right, left("k") === right("rk"))
      .select("k", "x", "name").collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(left, right, "k", "rk")
      .select("k", "x", "name").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length > 200, "hot key must actually be hot")
  }

  test("skewed two-phase aggregation equals direct aggregation") {
    val df = (1 to 5000).map(i => (if (i % 3 == 0) "hot" else s"k${i % 50}", i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val skewed = Skew.skewedSumCount(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(skewed == direct)
  }
}
