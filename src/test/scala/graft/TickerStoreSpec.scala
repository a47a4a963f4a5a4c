package graft

import org.apache.spark.sql.functions._
import graft.sources.{Quote, SyntheticQuoteSource, TickerStore}

class TickerStoreSpec extends SparkSpec {

  private val symbols = Seq("XT", "SCHX", "IXJ", "WCLD") // reference: main.py:96

  test("append stamps surrogate id and timestamps (models.py defaults)") {
    val store = new TickerStore(tmpDir("store_defaults_") + "/t")
    val quotes = new SyntheticQuoteSource().fetch(spark, symbols).toDF()
    store.append(quotes, "20221001")
    val back = store.read(spark)
    assert(back.count() == 4)
    assert(back.filter(col("id").isNull || col("created_at").isNull).count() == 0)
    assert(back.select("id").distinct().count() == 4, "surrogate ids must be unique")
    assert(back.select("partition_date").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("20221001"))
  }

  test("appends accumulate across partitions; partition read prunes") {
    val store = new TickerStore(tmpDir("store_parts_") + "/t")
    val src = new SyntheticQuoteSource()
    store.append(src.fetch(spark, symbols).toDF(), "20221001")
    store.append(src.fetch(spark, symbols).toDF(), "20221002")
    assert(store.read(spark).count() == 8)
    assert(store.readPartition(spark, "20221002").count() == 4)
    val plan = store.readPartition(spark, "20221002")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("partition_date"),
      s"expected partition pruning in:\n$plan")
  }

  test("overwritePartition is idempotent per partition (run_key semantics)") {
    val store = new TickerStore(tmpDir("store_idem_") + "/t")
    val src = new SyntheticQuoteSource()
    store.overwritePartition(src.fetch(spark, symbols).toDF(), "20221001")
    store.overwritePartition(src.fetch(spark, symbols).toDF(), "20221001")
    store.append(src.fetch(spark, symbols).toDF(), "20221002")
    store.overwritePartition(src.fetch(spark, symbols).toDF(), "20221002")
    assert(store.read(spark).count() == 8, "re-delivery must not duplicate")
  }

  test("synthetic quotes are deterministic and well-formed") {
    val q1 = new SyntheticQuoteSource().fetch(spark, symbols).collect().sortBy(_.symbol)
    val q2 = new SyntheticQuoteSource().fetch(spark, symbols).collect().sortBy(_.symbol)
    assert(q1.toSeq == q2.toSeq)
    q1.foreach { q =>
      assert(q.day_low <= q.market_price && q.market_price <= q.day_high,
        s"low<=price<=high violated for $q")
    }
  }

  test("syncPipeline returns the 5-most-recent run metadata (resources.py:52-53)") {
    val store = new TickerStore(tmpDir("store_sync_") + "/t")
    val out = TickerStore.syncPipeline(spark, new SyntheticQuoteSource(),
      symbols, "20221001", store)
    assert(out.count() == 4) // only 4 rows exist yet; limit(5) caps, not pads
    assert(store.read(spark).count() == 4)
  }
}
