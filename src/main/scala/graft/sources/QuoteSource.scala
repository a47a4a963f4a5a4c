package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One quote row, mirroring the reference's `Ticker` model
  * (reference: dagster_repository/models.py:7-19) minus the storage
  * surrogates (id/created_at/updated_at), which the sink owns
  * ([[TickerStore.append]]).
  */
case class Quote(
    name: String,
    quote_type: String,
    symbol: String,
    nav_price: Double,
    market_price: Double,
    market_open: Double,
    day_high: Double,
    day_low: Double,
    previous_close: Double)

/** Pluggable quote provider (SURVEY §2.1 S1/S2).
  *
  * The reference fetches per-symbol from yfinance over HTTP in a
  * sequential driver-side loop (reference: dagster_repository/ops.py:13-41,
  * main.py:25-57). That shape — N blocking REST calls on one thread — is
  * the part that cannot survive scale, so the engine inverts it: a source
  * returns a distributed Dataset and fan-out happens on executors.
  */
trait QuoteSource {
  /** Fetch quotes for the given symbols as a distributed Dataset —
    * one task per symbol partition, not a driver loop.
    */
  def fetch(spark: SparkSession, symbols: Seq[String]): Dataset[Quote]
}

/** Deterministic quote generator: a pure function of (symbol, seed) —
  * splitmix64-mixed, stable across JVMs/runs. Shared by the Dataset
  * provider and the DataSource V2 connector.
  */
object QuoteGen {
  /** Test instrument: quotes "fetched" since JVM start. Lets specs
    * PROVE pushdown pruned the fan-out (e.g. a completely-pushed
    * COUNT must fetch zero quotes). Counts per-JVM — in local mode
    * that is the whole job; on a real cluster each executor counts
    * its own fetches.
    */
  val fetches = new java.util.concurrent.atomic.AtomicLong(0)

  def quote(sym: String, seed: Long): Quote = {
    fetches.incrementAndGet()
    var z = sym.hashCode.toLong + seed * 0x9e3779b97f4a7c15L
    def next(): Double = {
      z += 0x9e3779b97f4a7c15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x = x ^ (x >>> 31)
      (x >>> 11).toDouble / (1L << 53).toDouble
    }
    val base = 50.0 + next() * 450.0
    val open = base * (0.97 + next() * 0.06)
    val px   = base * (0.97 + next() * 0.06)
    val hi   = math.max(open, px) * (1.0 + next() * 0.02)
    val lo   = math.min(open, px) * (1.0 - next() * 0.02)
    Quote(
      name = s"$sym Fund", quote_type = "ETF", symbol = sym,
      nav_price = base, market_price = px, market_open = open,
      day_high = hi, day_low = lo,
      previous_close = base * (0.97 + next() * 0.06))
  }
}

/** Deterministic offline provider (the container has no egress;
  * SURVEY §7.4). The `map` runs on executors: with 10k symbols this is
  * 10k-row-parallel, the reference's loop is 1-parallel.
  */
class SyntheticQuoteSource(seed: Long = 42L) extends QuoteSource {
  override def fetch(spark: SparkSession, symbols: Seq[String]): Dataset[Quote] = {
    import spark.implicits._
    val s = seed
    spark.createDataset(symbols).repartition(math.max(1, symbols.length / 1000))
      .map(sym => QuoteGen.quote(sym, s))
  }
}

/** Table-backed provider: quotes already landed in a parquet table
  * (the realistic 100 TB path — upstream ingestion wrote them; we scan
  * with an `isin` pushdown filter instead of calling an API).
  */
class ParquetQuoteSource(path: String) extends QuoteSource {
  override def fetch(spark: SparkSession, symbols: Seq[String]): Dataset[Quote] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    spark.read.parquet(path)
      .filter(col("symbol").isin(symbols: _*))
      .as[Quote]
  }
}
