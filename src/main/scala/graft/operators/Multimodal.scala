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
      // REAL header parsing where the container format carries the
      // dimensions (PNG IHDR / JPEG SOF); the fake pseudo-dims remain
      // only for payloads that are not actually image containers.
      val dims = HeaderParser.dims(bytes)
      MediaFeatures(
        doc_id = docId,
        n_bytes = bytes.length.toLong,
        kind = sniffKind(bytes),
        width = dims.map(_._1).getOrElse(math.abs(h % 1920).toInt + 1),
        height = dims.map(_._2).getOrElse(math.abs((h >> 16) % 1080).toInt + 1),
        feature_hash = h)
    }
  }

  /** Pure-JVM image header parsing — no codec library needed, because
    * dimensions live in fixed container metadata, not in the entropy-
    * coded stream:
    *  - PNG: the IHDR chunk is mandated to be first, so width/height
    *    are the big-endian u32s at byte offsets 16 and 20;
    *  - JPEG: walk the FF-marker segment chain to the first SOF marker
    *    (C0-CF minus C4/C8/CC); height/width are the big-endian u16s
    *    at offsets +5/+7 inside it.
    */
  object HeaderParser {
    private def u16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def u32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

    def pngDims(b: Array[Byte]): Option[(Int, Int)] =
      if (sniffKind(b) == "png" && b.length >= 24) Some((u32(b, 16), u32(b, 20)))
      else None

    def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      if (sniffKind(b) != "jpeg") return None
      var i = 2
      while (i + 9 < b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf
            && marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return Some((u16(b, i + 7), u16(b, i + 5)))
        else if (marker == 0xd9)
          return None // EOI: no SOF before end of stream
        else if (marker == 0xd8 || marker == 0x01
            || (marker >= 0xd0 && marker <= 0xd7))
          i += 2 // standalone markers (SOI/TEM/RSTn) carry no length
        else i += 2 + u16(b, i + 2)
      }
      None
    }

    def dims(b: Array[Byte]): Option[(Int, Int)] =
      pngDims(b).orElse(jpegDims(b))

    /** WAV (RIFF) audio header: walk chunks to "fmt " and read the
      * LITTLE-endian u16 channel count / u32 sample rate (RIFF is LE
      * throughout — the mirror image of PNG's network order).
      */
    def wavInfo(b: Array[Byte]): Option[(Int, Int)] = {
      if (sniffKind(b) != "riff" || b.length < 12
          || !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      def u16le(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      def u32le(i: Int): Int =
        (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
          ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
      var i = 12
      while (i + 8 <= b.length) {
        val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
        val size = u32le(i + 4)
        if (isFmt && i + 8 + 8 <= b.length)
          return Some((u16le(i + 10), u32le(i + 12))) // (channels, sampleRate)
        i += 8 + size + (size & 1) // chunks are word-aligned
      }
      None
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

  /** Gated m2: build REAL PNG headers distributed (signature + IHDR
    * with dimensions planted from doc_id), then parse width/height
    * back out of the binary column — everything codegen'd built-ins
    * (concat/unhex for construction, substring/hex/conv for parsing;
    * zero UDFs). The planted values are pure doc_id arithmetic, which
    * is what the DuckDB oracle states — so the gate hash-checks the
    * whole build→parse round-trip over the binary column type.
    */
  def pngHeaderRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val pngSigAndIhdr: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, // signature
        0, 0, 0, 0x0d, 'I', 'H', 'D', 'R').map(_.toByte) // len=13, "IHDR"
    val ihdrTail: Array[Byte] = Array[Byte](8, 6, 0, 0, 0) // depth/color/...
    def be32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
    val payload = concat(lit(pngSigAndIhdr),
      be32(col("doc_id") % 1920 + 1), be32(col("doc_id") % 1080 + 1),
      lit(ihdrTail))
    def parsed(off: Int): Column =
      conv(hex(substring(col("payload"), off, 4)), 16, 10).cast("int")
    Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"), parsed(17).as("width"), parsed(21).as("height"))
      .orderBy(col("doc_id"))
  }

  /** Gated m3: the audio twin of [[pngHeaderRoundtrip]] — build real
    * WAV headers distributed (RIFF/WAVE + fmt chunk with planted
    * little-endian channel count and sample rate), parse them back
    * columnar. LE fields are assembled and re-read byte-at-a-time
    * with hex/unhex built-ins (Spark has no LE integer codec — the
    * per-byte form IS the LE codec, and it stays codegen'd).
    */
  def wavHeaderRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    def byteAt(v: Column, i: Int): Column = // i-th LE byte as 1 binary byte
      unhex(lpad(hex(shiftright(v.cast("long"), 8 * i) % 256), 2, "0"))
    def le(v: Column, n: Int): Column = concat((0 until n).map(byteAt(v, _)): _*)
    val channels = (col("doc_id") % 2 + 1).cast("int")
    val rate = when(col("doc_id") % 3 === 0, 44100)
      .when(col("doc_id") % 3 === 1, 22050).otherwise(16000)
    val payload = concat(
      lit("RIFF".getBytes), le(lit(36), 4), lit("WAVE".getBytes),
      lit("fmt ".getBytes), le(lit(16), 4),
      le(lit(1), 2),        // PCM
      le(channels, 2), le(rate, 4),
      le(rate * channels * lit(2), 4), // byte rate
      le(channels * lit(2), 2), le(lit(16), 2))
    def u16le(off: Int): Column =
      (conv(hex(substring(col("payload"), off, 1)), 16, 10).cast("int")
        + conv(hex(substring(col("payload"), off + 1, 1)), 16, 10).cast("int") * 256)
    def u32le(off: Int): Column =
      (0 until 4).map(i =>
        conv(hex(substring(col("payload"), off + i, 1)), 16, 10).cast("long")
          * (1L << (8 * i)) : Column).reduce(_ + _)
    Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"),
        u16le(23).as("n_channels"),
        u32le(25).cast("int").as("sample_rate"))
      .orderBy(col("doc_id"))
  }

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
