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
}
