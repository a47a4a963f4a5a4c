package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 SINK — the write-side complement of
  * [[QuoteDataSource]] (SURVEY §2.2): the full V2 batch-write commit
  * protocol, exercised end-to-end by the k7 gate.
  *
  * {{{
  * df.write.format("graft.sources.v2.LocalFileSink")
  *   .option("path", "/data/out").mode("append").save()
  * }}}
  *
  * What this demonstrates (the part that matters at any scale):
  * EXACTLY-ONCE PUBLISH. Executors write to a hidden staging name;
  * only `DataWriter.commit()` reports a file in its commit message;
  * the driver's `BatchWrite.commit(messages)` atomically renames
  * exactly the reported files into the table root. A speculative or
  * failed task attempt that never commits leaves only staging residue
  * that `abort()` clears — readers can never observe a torn write.
  *
  * Rows are encoded as CSV lines (primitive schemas; Spark's CSV
  * reader round-trips them by schema). On a single-node FS the
  * publish is a rename; a production build would swap the rename for
  * a DFS manifest commit and keep the protocol shape — which is the
  * point of gating the protocol, not the encoding.
  */
class LocalFileSink extends TableProvider {
  // Write-only source: the schema always comes from the DataFrame
  // being written (external metadata), never from inference.
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "LocalFileSink is write-only; schema comes from the DataFrame")
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException("LocalFileSink requires a 'path' option"))
    new LocalFileSinkTable(path, schema)
  }
}

class LocalFileSinkTable(path: String, tschema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"local_file_sink($path)"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = {
        // k15: a sink that DEMANDS layout. With clusterBy/sortBy write
        // options, the Write advertises RequiresDistributionAndOrdering
        // and SPARK plans the hash exchange + per-partition sort before
        // any writer runs — the connector states the contract, the
        // engine satisfies it (the V2-native form of bucketed writes:
        // every cluster key lands wholly inside one writer task, rows
        // arrive sorted, so downstream readers get coarse clustering
        // for free however the input was partitioned).
        val cluster = Option(info.options().get("clusterBy")).filter(_.nonEmpty)
        val sortCol = Option(info.options().get("sortBy")).filter(_.nonEmpty)
        // writeSeq: append a trailing per-writer row-sequence cell —
        // an explicit in-file position witness. Readers that split a
        // large file across partitions (Spark bin-packs CSV splits by
        // size) cannot reconstruct write order from read order or
        // monotonically_increasing_id(); the recorded sequence is the
        // only split-safe statement of "the order this writer wrote".
        val writeSeq = Option(info.options().get("writeSeq")).exists(_.toBoolean)
        cluster match {
          case Some(c) => new Write with RequiresDistributionAndOrdering {
            import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
            import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => V2SortOrder}
            override def requiredDistribution(): Distribution =
              Distributions.clustered(Array(Expressions.identity(c)))
            override def requiredOrdering(): Array[V2SortOrder] =
              (c +: sortCol.toSeq).map(s => Expressions.sort(
                Expressions.identity(s), SortDirection.ASCENDING)).toArray
            override def toBatch: BatchWrite =
              new LocalFileBatchWrite(path, info.schema(), doTruncate, writeSeq)
          }
          case None => new Write {
            override def toBatch: BatchWrite =
              new LocalFileBatchWrite(path, info.schema(), doTruncate, writeSeq)
          }
        }
      }
    }
}

case class CommittedFile(stagedPath: String, finalName: String)
    extends WriterCommitMessage

class LocalFileBatchWrite(path: String, schema: StructType, truncate: Boolean,
                          writeSeq: Boolean = false)
    extends BatchWrite {
  private val staging = s"$path/_staging"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new java.io.File(staging).mkdirs()
    LocalFileWriterFactory(staging, schema, writeSeq)
  }

  /** Driver-side publish: move EXACTLY the files the committed task
    * attempts reported. Uncommitted attempts (failures, speculative
    * losers) never appear in `messages`, so their staging files are
    * simply swept with the staging dir.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new java.io.File(path)
    if (truncate) Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".csv")).foreach(_.delete())
    messages.foreach { case CommittedFile(staged, finalName) =>
      val src = new java.io.File(staged)
      if (src.exists()) // empty partitions commit no file
        java.nio.file.Files.move(src.toPath,
          new java.io.File(root, finalName).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    graft.TmpIO.deleteRecursively(new java.io.File(staging))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    graft.TmpIO.deleteRecursively(new java.io.File(staging))
}

case class LocalFileWriterFactory(staging: String, schema: StructType,
                                  writeSeq: Boolean = false)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LocalFileDataWriter(staging, schema, partitionId, taskId, writeSeq)
}

/** Executor-side writer: streams rows to a per-ATTEMPT staging file
  * (partitionId + taskId in the name keeps concurrent attempts of the
  * same partition from clobbering each other); `commit()` is the only
  * place the file becomes eligible for publish.
  */
class LocalFileDataWriter(staging: String, schema: StructType,
                          partitionId: Int, taskId: Long,
                          writeSeq: Boolean = false)
    extends DataWriter[InternalRow] {
  private val staged = s"$staging/attempt-$partitionId-$taskId.csv"
  private var out: java.io.BufferedWriter = _
  private var wrote = false
  private var seq = 0L

  override def write(row: InternalRow): Unit = {
    if (out == null)
      out = new java.io.BufferedWriter(new java.io.FileWriter(staged))
    val cells = schema.fields.indices.map { i =>
      if (row.isNullAt(i)) ""
      else schema.fields(i).dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case StringType => row.getUTF8String(i).toString
        case BooleanType => row.getBoolean(i).toString
        case t => throw new UnsupportedOperationException(
          s"LocalFileSink supports primitive columns only, got $t")
      }
    }
    out.write(cells.mkString(","))
    if (writeSeq) { out.write(","); out.write(seq.toString); seq += 1 }
    out.newLine()
    wrote = true
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    // Empty partitions publish nothing (stagedPath won't exist).
    CommittedFile(if (wrote) staged else staged + ".absent",
      f"part-$partitionId%05d-$taskId.csv")
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    new java.io.File(staged).delete()
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}
