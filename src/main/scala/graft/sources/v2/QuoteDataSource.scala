package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.QuoteGen

/** DataSource V2 connector for the quote feed — the reference's
  * yfinance ingest (SURVEY §2.1 S1/S2: driver-side sequential HTTP
  * loop, ops.py:32-41) as a first-class Spark source:
  *
  * {{{
  * spark.read.format("graft.sources.v2.QuoteDataSource")
  *   .option("symbols", "XT,SCHX,IXJ,WCLD").option("seed", "42")
  *   .load()
  * }}}
  *
  * The connector owns the fan-out: ONE InputPartition PER SYMBOL, so a
  * 10k-symbol universe fetches 10k-way parallel on executors — the
  * planner sees a normal scan it can prune and count. The actual
  * "fetch" is the deterministic offline generator (zero-egress
  * container); a production build would swap the PartitionReader body
  * for the HTTP call and keep every other line.
  */
class QuoteDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QuoteDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // Reader options arrive as a plain (case-sensitive) map here; an
    // option spelled "Symbols" would silently plan an empty scan.
    // Normalize through CaseInsensitiveStringMap and fail fast when no
    // symbols are given — an empty universe is a config error, not an
    // empty result.
    val opts = new CaseInsensitiveStringMap(properties)
    val symbols = Option(opts.get("symbols")).getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(symbols.nonEmpty,
      "QuoteDataSource requires a non-empty 'symbols' option, e.g. " +
        ".option(\"symbols\", \"XT,SCHX\")")
    new QuoteTable(symbols, opts.getLong("seed", 42L))
  }
}

object QuoteDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("name", StringType), StructField("quote_type", StringType),
    StructField("symbol", StringType), StructField("nav_price", DoubleType),
    StructField("market_price", DoubleType), StructField("market_open", DoubleType),
    StructField("day_high", DoubleType), StructField("day_low", DoubleType),
    StructField("previous_close", DoubleType)))
}

class QuoteTable(symbols: Array[String], seed: Long) extends Table with SupportsRead {
  override def name(): String = s"quotes(${symbols.length} symbols)"
  override def schema(): StructType = QuoteDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new QuoteScan(symbols, seed)
}

class QuoteScan(symbols: Array[String], seed: Long) extends Scan with Batch {
  override def readSchema(): StructType = QuoteDataSource.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    symbols.map(s => QuotePartition(s, seed): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    QuoteReaderFactory
}

case class QuotePartition(symbol: String, seed: Long) extends InputPartition

object QuoteReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[QuotePartition]
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = if (consumed) false else { consumed = true; true }
      override def get(): InternalRow = {
        // Production seam: replace this line with the live API call.
        val q = QuoteGen.quote(p.symbol, p.seed)
        InternalRow(
          UTF8String.fromString(q.name), UTF8String.fromString(q.quote_type),
          UTF8String.fromString(q.symbol), q.nav_price, q.market_price,
          q.market_open, q.day_high, q.day_low, q.previous_close)
      }
      override def close(): Unit = ()
    }
  }
}
