package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (north-star extension): treat media
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as a typed `mapPartitions` stage.
  *
  * The Spark-side shape is the real deliverable here — schema, batch
  * iteration, partitioning — while the codec itself is STUBBED
  * (`FakeDecoder`): this container has no image/audio libraries, so
  * the decoder is a deterministic fake with the exact signature a real
  * one (JNI/FFI to a codec, or an Arrow-batched Python worker) would
  * plug into.
  *
  * Scale notes: binary payloads stay columnar in parquet; metadata
  * extraction prunes to (id, len, magic) without materializing bodies
  * when the plan allows; `mapPartitions` amortizes decoder init
  * (model/codec load) once per partition, not per row — the same
  * reason Arrow-batched UDFs batch their input.
  */
object Multimodal {

  /** A decoded media asset's features — what a real decoder would
    * emit (dimensions, channels, a feature digest).
    */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      kind: String,
      width: Int,
      height: Int,
      feature_hash: Long)

  /** The decoder seam. A production implementation decodes the payload
    * (libjpeg/ffmpeg/...); the fake derives deterministic pseudo
    * features from the bytes so the distributed plumbing is testable
    * offline. STUB — the decode math is intentionally fake.
    */
  trait Decoder extends Serializable {
    def decode(docId: Long, bytes: Array[Byte]): MediaFeatures
  }

  object FakeDecoder extends Decoder {
    override def decode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
      var h = 1469598103934665603L // FNV-1a over the payload
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 1099511628211L; i += 1 }
      MediaFeatures(
        doc_id = docId,
        n_bytes = bytes.length.toLong,
        kind = sniffKind(bytes),
        width = math.abs(h % 1920).toInt + 1,   // STUB: fake dimensions
        height = math.abs((h >> 16) % 1080).toInt + 1,
        feature_hash = h)
    }
  }

  /** Magic-byte content sniffing — real (the tiny part that needs no
    * codec): JPEG/PNG/RIFF(WAV-AVI)/else.
    */
  def sniffKind(b: Array[Byte]): String =
    if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') "riff"
    else "bin"

  /** Binary asset table derived from documents (the test corpus has no
    * real media; UTF-8 bodies stand in as payloads — the column TYPE
    * and everything downstream is exactly what real media would use).
    */
  def assetTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Metadata pass (query m1): payload size + sniffed kind, computed
    * columnar (octet length + magic-byte substring checks) — no
    * decoder needed, fully oracle-checkable.
    */
  def assetMetadata(spark: SparkSession, dir: String): DataFrame =
    assetTable(spark, dir)
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"))
      .orderBy(col("doc_id"))

  /** Feature-extraction pass: typed mapPartitions through the decoder
    * seam — one decoder instance per partition, rows streamed through
    * it. Exercised by ScalaTest (the fake decoder's output is
    * deterministic but not SQL-expressible).
    */
  def extractFeatures(spark: SparkSession, dir: String,
                      decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    assetTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder init happens here, once per partition
        rows.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
  }
}
