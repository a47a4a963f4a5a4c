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
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new QuoteScanBuilder(symbols, seed, options.getInt("rounds", 3))
}

/** Pushdown-aware scan builder. For a remote-fetch source, pushdown is
  * where the money is:
  *
  *  - symbol predicates (`symbol = 'XT'`, `symbol IN (...)`) prune the
  *    FETCH fan-out itself — a filtered read plans only the matching
  *    InputPartitions, so the "HTTP calls" for every other symbol never
  *    happen (partition pruning for a service, not a filesystem);
  *  - column pruning means a `select(symbol, market_price)` ships two
  *    fields per row from the executors instead of nine.
  *
  * Catalyst calls pushPredicates/pruneColumns before build(); whatever
  * we do not accept stays as a post-scan Filter, so accepting only the
  * clean symbol predicates is always safe.
  */
class QuoteScanBuilder(allSymbols: Array[String], seed: Long, rounds: Int = 3)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit
    with SupportsPushDownTopN {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder => V2SortOrder}
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}

  private var symbols: Array[String] = allSymbols
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = QuoteDataSource.Schema
  private var aggPushed: Option[Aggregation] = None

  private def isSymbolRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("symbol"))
      case _ => false
    }

  /** COUNT(*) / MIN(symbol) / MAX(symbol) with no GROUP BY are
    * answerable from the SYMBOL UNIVERSE alone — the connector never
    * fetches a single quote. For a remote-fetch source this is the
    * strongest pushdown there is: `SELECT count(*) FROM quotes` on a
    * 10k-symbol universe plans one 1-row partition and zero API
    * calls, where the unpushed plan makes 10k calls to count rows it
    * then discards. Complete pushdown (not partial): the scan emits
    * the FINAL aggregate row, positionally matching
    * `aggregateExpressions`.
    */
  private def answerable(agg: Aggregation): Boolean = {
    // GROUP BY is accepted only when it is exactly [symbol]: one row
    // per symbol in the universe, each aggregate still derivable
    // without a fetch (count = 1 per symbol by the source contract).
    val groupOk = agg.groupByExpressions.isEmpty ||
      (agg.groupByExpressions.length == 1 && isSymbolRef(agg.groupByExpressions.head))
    groupOk && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => isSymbolRef(m.column)
        case m: Max => isSymbolRef(m.column)
        case _ => false
      }
  }

  // Both limit and top-N stay PARTIAL (Spark keeps its own
  // Limit/Sort on top): the connector's cut is a fetch prune, never
  // load-bearing for correctness. Required explicitly because both
  // parent traits supply the same Java default method.
  override def isPartiallyPushed(): Boolean = true

  override def supportCompletePushDown(agg: Aggregation): Boolean = answerable(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = answerable(agg)
    if (ok) aggPushed = Some(agg)
    ok
  }

  /** One row per symbol makes LIMIT exact at the source: keep the
    * first n symbols and the fetch fan-out shrinks from |universe| to
    * n. Spark keeps its own Limit on top (partial pushdown, the
    * default) — correctness never depends on the connector's cut.
    */
  override def pushLimit(n: Int): Boolean = {
    symbols = symbols.take(n)
    true
  }

  /** ORDER BY symbol [ASC|DESC] LIMIT n: sort the universe, keep n —
    * only the winning n symbols are ever fetched. Spark retains the
    * global Sort+Limit (partial pushdown), so this is purely a
    * fan-out prune; any other sort key is refused (it would need the
    * fetched values we are trying not to fetch).
    */
  override def pushTopN(orders: Array[V2SortOrder], n: Int): Boolean =
    orders match {
      case Array(o) if isSymbolRef(o.expression) =>
        val asc = o.direction == SortDirection.ASCENDING
        symbols = (if (asc) symbols.sorted else symbols.sorted.reverse).take(n)
        true
      case _ => false
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("symbol", _: String) => true
      case In("symbol", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    accepted.foreach {
      case EqualTo("symbol", v: String) => symbols = symbols.filter(_ == v)
      case In("symbol", vs) =>
        val set = vs.collect { case s: String => s }.toSet
        symbols = symbols.filter(set)
      case _ => ()
    }
    pushed = accepted
    // Symbol pruning is EXACT, so accepted filters need no re-check
    // post-scan: only the rejected ones go back to Catalyst.
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Preserve source field order for a deterministic reader layout.
    required = StructType(
      QuoteDataSource.Schema.fields.filter(f =>
        requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = aggPushed match {
    case Some(agg) => new QuoteAggScan(symbols, agg)
    case None      => new QuoteScan(symbols, seed, required, rounds)
  }
}

/** Scan for a COMPLETELY pushed aggregation, computed from the symbol
  * universe without invoking the fetch path. Ungrouped: one partition,
  * one row. GROUP BY symbol: one row per symbol (count = 1 each, by
  * the one-row-per-symbol source contract). Output fields are
  * positional — group columns first, then aggregates (LongType for
  * COUNT(*), StringType for MIN/MAX(symbol)); names cosmetic.
  */
class QuoteAggScan(
    symbols: Array[String],
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}

  private val grouped = agg.groupByExpressions.nonEmpty

  override def readSchema(): StructType = StructType(
    agg.groupByExpressions.zipWithIndex.map {
      case (_, i) => StructField(s"group_$i", StringType)
    } ++
    agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i)            => StructField(s"agg_$i", StringType)
    })
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    if (grouped) {
      // One row per symbol; per-symbol "universe" is the singleton.
      symbols.map { s =>
        val values: Array[Any] = Array[Any](UTF8String.fromString(s)) ++
          agg.aggregateExpressions.map {
            case _: CountStar => 1L
            case _: Min       => UTF8String.fromString(s)
            case _: Max       => UTF8String.fromString(s)
            case other => throw new IllegalStateException(s"unpushable agg $other")
          }
        QuoteAggPartition(values): InputPartition
      }
    } else {
      val values: Array[Any] = agg.aggregateExpressions.map {
        case _: CountStar => symbols.length.toLong
        case _: Min       => UTF8String.fromString(symbols.min)
        case _: Max       => UTF8String.fromString(symbols.max)
        case other => throw new IllegalStateException(s"unpushable agg $other")
      }
      Array(QuoteAggPartition(values))
    }
  override def createReaderFactory(): PartitionReaderFactory = QuoteAggReaderFactory
}

case class QuoteAggPartition(values: Array[Any]) extends InputPartition

object QuoteAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[QuoteAggPartition]
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = if (consumed) false else { consumed = true; true }
      override def get(): InternalRow = InternalRow.fromSeq(p.values.toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}

/** RUNTIME (dynamic) filtering: when the quote scan sits under a join
  * whose other side is small and filtered — `quotes JOIN dims ON
  * symbol = ...` — Spark evaluates the dim side first (reusing its
  * broadcast) and hands the actual join keys to [[filter]] before
  * input partitions are planned. For a fetch source this is dynamic
  * partition pruning over API calls: only symbols that can survive
  * the join are ever fetched. Planner-driven and best-effort — the
  * scan stays correct (Spark re-applies the join) if the rule never
  * fires.
  */
class QuoteScan(allSymbols: Array[String], seed: Long, required: StructType,
                rounds: Int = 3)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportPartitioning {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
  import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
  import org.apache.spark.sql.sources.{EqualTo, Filter, In}

  private var symbols: Array[String] = allSymbols

  /** The connector's layout IS a partitioning: one InputPartition per
    * symbol (each row's key equals its partition's key), so the scan
    * reports `KeyGroupedPartitioning(identity(symbol))` and Spark —
    * with DSv2 bucketing on — satisfies a `groupBy(symbol)` /
    * storage-partitioned join distribution WITHOUT an Exchange. For a
    * remote-fetch source that is the difference between "fetch, then
    * shuffle everything once per query" and "fetch is already the
    * shuffle": at a 10k-symbol universe the aggregation runs fetch-
    * local. Reported only while `symbol` survives column pruning — a
    * clustering key absent from the output is meaningless (Spark
    * would ignore it, but don't make the planner guess).
    */
  override def outputPartitioning(): Partitioning =
    if (required.fieldNames.contains("symbol"))
      new KeyGroupedPartitioning(
        Array(Expressions.identity("symbol")), symbols.length)
    else new UnknownPartitioning(symbols.length)

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("symbol"))
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("symbol", vs) =>
      val keep = vs.collect { case s: String => s }.toSet
      symbols = symbols.filter(keep)
    case EqualTo("symbol", v: String) => symbols = symbols.filter(_ == v)
    case _ => () // unknown runtime predicate: prune nothing, stay correct
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    symbols.map(s => QuotePartition(s, seed, required.fieldNames): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    QuoteReaderFactory
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new QuoteMicroBatchStream(symbols, seed, required, rounds)
}

/** STREAMING form of the quote source — the reference's sensor/poll
  * loop (sensors.py: poll every >=10 s, fetch, append) as a
  * first-class DSv2 `MicroBatchStream`. An offset is simply the
  * number of completed poll rounds; each round fetches one quote per
  * symbol (deterministic per (symbol, seed+round), standing in for
  * the live API call), planned one partition per (round, symbol) so
  * the fan-out parallelizes exactly like the batch path. Offsets are
  * checkpoint-serializable, so restarts resume at the committed
  * round — exactly-once ingest with no bespoke state. `rounds` caps
  * the feed for AvailableNow/test runs; a live deployment would
  * return an ever-advancing latestOffset instead.
  */
class QuoteMicroBatchStream(symbols: Array[String], seed: Long,
                            required: StructType, rounds: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class RoundOffset(round: Int) extends Offset {
    override def json(): String = round.toString
  }

  override def initialOffset(): Offset = RoundOffset(0)
  override def latestOffset(): Offset = RoundOffset(rounds)
  override def deserializeOffset(json: String): Offset = RoundOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s0, s1) = (start.asInstanceOf[RoundOffset].round, end.asInstanceOf[RoundOffset].round)
    (for {
      r <- s0 until s1
      sym <- symbols
    } yield QuotePartition(sym, seed + r, required.fieldNames): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = QuoteReaderFactory
}

case class QuotePartition(symbol: String, seed: Long,
                          fields: Array[String])
    extends InputPartition with HasPartitionKey {
  // Contract for KeyGroupedPartitioning: every row this partition
  // yields has exactly this key (trivially true — one symbol each).
  override def partitionKey(): InternalRow =
    InternalRow(UTF8String.fromString(symbol))
}

object QuoteReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[QuotePartition]
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = if (consumed) false else { consumed = true; true }
      override def get(): InternalRow = {
        // Production seam: replace this line with the live API call.
        val q = QuoteGen.quote(p.symbol, p.seed)
        val byName: String => Any = {
          case "name" => UTF8String.fromString(q.name)
          case "quote_type" => UTF8String.fromString(q.quote_type)
          case "symbol" => UTF8String.fromString(q.symbol)
          case "nav_price" => q.nav_price
          case "market_price" => q.market_price
          case "market_open" => q.market_open
          case "day_high" => q.day_high
          case "day_low" => q.day_low
          case "previous_close" => q.previous_close
        }
        InternalRow.fromSeq(p.fields.toIndexedSeq.map(byName))
      }
      override def close(): Unit = ()
    }
  }
}
