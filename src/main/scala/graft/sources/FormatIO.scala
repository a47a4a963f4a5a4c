package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic batch IO (source/sink breadth beyond parquet —
  * the reference's only storage was a SQLite file plus an HTTP quote
  * API; SURVEY §1.1. An engine a reference user switches to needs the
  * standard lake formats).
  *
  * Format notes that matter at scale:
  *  - parquet/orc: columnar, splittable, predicate+projection pushdown
  *    — the defaults for anything large.
  *  - csv/json: row formats for interchange; schema must be declared
  *    on read (schema inference is a full extra pass over 100 TB).
  *    CSV cannot carry nested types; JSON can but loses type width.
  */
object FormatIO {
  val Formats: Seq[String] = Seq("parquet", "orc", "csv", "json")

  def write(df: DataFrame, format: String, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  /** Read with a DECLARED schema — never infer on big data: inference
    * is an extra full scan for csv/json and samples can lie.
    */
  def read(spark: SparkSession, format: String, path: String,
           schema: StructType): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv") r.option("header", "true") else r).load(path)
  }

  /** Gate k8: SCHEMA EVOLUTION across parquet batches — the ingestion
    * reality that a long-lived table's early files lack columns added
    * later. Two batches with different column sets land in one
    * directory; `mergeSchema` reconciles the footers into the union
    * schema and nulls the absent columns per file. (Merging is a
    * footer-only operation — at 100 TB it reads kilobytes per file,
    * which is why it stays an explicit opt-in rather than the default.)
    * Oracle mirrors the per-batch column masks with CASE.
    */
  def schemaEvolutionGate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val tmp = graft.TmpIO.stableDir("k8") // corpus-sized union read: lazy
    val e = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    // early files: no `value` column yet
    e.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .write.parquet(s"$tmp/t/b1")
    // later files: `value` added, `user_id` dropped upstream
    e.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("event_type"), col("value"))
      .write.parquet(s"$tmp/t/b2")
    val merged = spark.read.option("mergeSchema", "true")
      .option("recursiveFileLookup", "true").parquet(s"$tmp/t")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    merged.orderBy(col("event_id"))
  }
}
