package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (north-star extension): treat media
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as a typed `mapPartitions` stage.
  *
  * Decode is REAL for the formats the JDK ships codecs for:
  * [[ImageIODecoder]] (javax.imageio — PNG/JPEG/BMP/GIF, headless) and
  * [[WavDecoder]] (javax.sound.sampled — PCM WAV). [[FakeDecoder]]
  * remains only for payloads with no JVM codec (opaque `bin`), where it
  * derives deterministic pseudo-features so the distributed plumbing
  * stays testable on any payload.
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

  /** The decoder seam. [[HybridDecoder]] (the default) decodes real
    * image containers with javax.imageio and falls back to
    * [[FakeDecoder]]'s deterministic pseudo-features for payloads that
    * are not decodable media (the test corpus is UTF-8 text).
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

  /** Decoded raster statistics — what [[ImageIODecoder]] extracts from
    * real pixel data (unrounded means; presentation rounding happens in
    * the DataFrame so Spark's `round` semantics apply).
    */
  case class ImageStats(
      width: Int,
      height: Int,
      n_channels: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** REAL image decoder: javax.imageio (JDK built-in, headless-safe —
    * no external library needed for PNG/JPEG/BMP/GIF). Returns None for
    * payloads ImageIO has no codec for.
    */
  object ImageIODecoder extends Serializable {
    // One-time per-JVM codec config: headless AWT, and no disk-backed
    // ImageInputStream cache (executors would otherwise hit /tmp per row).
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)

    def decode(bytes: Array[Byte]): Option[ImageStats] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      Option(img).map { im =>
        val w = im.getWidth
        val h = im.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y) // sRGB, exact for 8-bit lossless input
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        ImageStats(w, h, im.getRaster.getNumBands,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }

    /** Exact integer channel sums — the order-invariant shape for
      * AGGREGATING decoded stats across frames/files (divide once at
      * the end; per-frame double means would make the cross-frame sum
      * accumulation-order-dependent).
      */
    def decodeSums(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      Option(img).map { im =>
        val w = im.getWidth
        val h = im.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        (w, h, sr, sg, sb)
      }
    }
  }

  /** Default decoder for [[extractFeatures]]: real ImageIO decode when
    * the payload is a decodable image, [[FakeDecoder]] pseudo-features
    * otherwise (the corpus payloads are UTF-8 text, kind `bin`).
    */
  object HybridDecoder extends Decoder {
    override def decode(docId: Long, bytes: Array[Byte]): MediaFeatures =
      ImageIODecoder.decode(bytes) match {
        case Some(s) =>
          val fake = FakeDecoder.decode(docId, bytes)
          fake.copy(width = s.width, height = s.height)
        case None => FakeDecoder.decode(docId, bytes)
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

  // ------------------------------------------------------------------
  // Planted media fixtures: REAL encoded files built distributed, with
  // every pixel/sample value a pure function of doc_id — so a DuckDB
  // oracle can state the expected decode statistics as arithmetic while
  // the Spark side must run a genuine codec round-trip to recover them.
  // ------------------------------------------------------------------

  /** Per-doc planted image parameters (all doc_id arithmetic; the m4
    * oracle SQL mirrors these formulas exactly). The image is two-tone
    * — left `width/2` columns colour A, the rest colour B — so the mean
    * depends on actual pixel traversal, not any header field.
    */
  private[graft] final case class PlantedImage(id: Long) {
    val width: Int = (id % 16 + 4).toInt
    val height: Int = (id % 12 + 4).toInt
    val wLeft: Int = width / 2
    val rA: Int = (id % 256).toInt
    val gA: Int = (id * 7 % 256).toInt
    val bA: Int = (id * 13 % 256).toInt
    val rB: Int = (id * 31 % 256).toInt
    val gB: Int = (id * 37 % 256).toInt
    val bB: Int = (id * 41 % 256).toInt
  }

  /** Encode the planted image as a REAL PNG via ImageIO (zlib'd IDAT,
    * CRCs — the genuine container, not a hand-built header).
    */
  private[graft] def encodePlantedPng(id: Long): Array[Byte] = {
    val p = PlantedImage(id)
    val im = new java.awt.image.BufferedImage(
      p.width, p.height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < p.height) {
      var x = 0
      while (x < p.width) {
        val (r, g, b) = if (x < p.wLeft) (p.rA, p.gA, p.bA) else (p.rB, p.gB, p.bB)
        im.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    out.toByteArray
  }

  /** Gated m4: encode planted PNGs distributed, decode them back with
    * the REAL ImageIO decoder, and emit per-image pixel statistics.
    * Recovering the means requires inflating the IDAT stream and
    * walking the raster — header parsing cannot answer this query. The
    * oracle states the same statistics as doc_id arithmetic.
    *
    * Determinism: per-image sums are exact integers (< 2^53); one IEEE
    * double division each side of the gate is correctly rounded to the
    * identical double; `round(_, 6)` applied by Spark itself.
    */
  def imageDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val decoded = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val s = ImageIODecoder.decode(encodePlantedPng(id))
            .getOrElse(sys.error(s"ImageIO failed to decode planted PNG for doc $id"))
          (id, s.width, s.height, s.n_channels, s.mean_r, s.mean_g, s.mean_b)
        }
      }
      .toDF("doc_id", "width", "height", "n_channels", "mr", "mg", "mb")
    decoded.select(
        col("doc_id"), col("width"), col("height"), col("n_channels"),
        round(col("mr"), 6).as("mean_r"),
        round(col("mg"), 6).as("mean_g"),
        round(col("mb"), 6).as("mean_b"),
        round(lit(0.299) * col("mr") + lit(0.587) * col("mg")
          + lit(0.114) * col("mb"), 6).as("mean_luma"))
      .orderBy(col("doc_id"))
  }

  /** Gated m9: RESIZE (nearest-neighbor thumbnail) over REAL decoded
    * rasters — the preprocessing step every vision-model pipeline
    * runs before feature extraction. Each planted PNG is decoded
    * with ImageIO and resampled to a 4×4 grid with the standard NN
    * map src_x = ⌊x'·w/4⌋ (integer arithmetic, no filtering), then
    * per-channel means over the 16 samples are emitted.
    *
    * Decode+resize is embarrassingly parallel (mapPartitions, no
    * shuffle; at 100 TB the thumbnail table is a constant 48 bytes
    * per image regardless of source resolution). Sample sums are
    * exact integers, so the means hash-match the oracle's
    * closed-form replay of the same NN index arithmetic.
    */
  def resizeStats(spark: SparkSession, dir: String,
                  tw: Int = 4, th: Int = 4): DataFrame = {
    import spark.implicits._
    val resized = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val im = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(encodePlantedPng(id)))
          require(im != null, s"ImageIO failed to decode planted PNG for doc $id")
          var (sr, sg, sb) = (0L, 0L, 0L)
          var yy = 0
          while (yy < th) {
            var xx = 0
            val sy = yy * im.getHeight / th
            while (xx < tw) {
              val sx = xx * im.getWidth / tw
              val rgb = im.getRGB(sx, sy)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              xx += 1
            }
            yy += 1
          }
          val n = (tw * th).toDouble
          (id, sr / n, sg / n, sb / n)
        }
      }
      .toDF("doc_id", "mr", "mg", "mb")
    resized.select(col("doc_id"),
        round(col("mr"), 6).as("mean_r4"),
        round(col("mg"), 6).as("mean_g4"),
        round(col("mb"), 6).as("mean_b4"))
      .orderBy(col("doc_id"))
  }

  /** Gated m8: VISUAL near-dup grouping — dedup driven by decoded
    * pixel content, not bytes. Each image's decoded mean RGB is
    * quantized to a coarse color signature (floor(mean/32): 8 cells
    * per channel) and images sharing a signature form a candidate
    * dup group — the cheap first stage of any visual dedup pipeline
    * (a finer perceptual hash or embedding pass would re-rank inside
    * groups).
    *
    * Scale shape: decode is embarrassingly parallel (mapPartitions,
    * no shuffle); the group stage shuffles a 3-int signature per
    * image — at 100 TB of images the signature table is ~10⁻⁶ the
    * corpus size. The quantized floor is computed from the same
    * IEEE doubles on both engines, so the gate hash-matches the
    * closed-form oracle over the planted two-tone rasters.
    */
  def visualDupGroups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val decoded = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val s = ImageIODecoder.decode(encodePlantedPng(id))
            .getOrElse(sys.error(s"ImageIO failed to decode planted PNG for doc $id"))
          (id, s.mean_r, s.mean_g, s.mean_b)
        }
      }
      .toDF("doc_id", "mr", "mg", "mb")
    decoded.select(col("doc_id"),
        floor(col("mr") / lit(32.0)).cast("int").as("qr"),
        floor(col("mg") / lit(32.0)).cast("int").as("qg"),
        floor(col("mb") / lit(32.0)).cast("int").as("qb"))
      .groupBy(col("qr"), col("qg"), col("qb"))
      .agg(count(lit(1)).as("n_images"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .filter(col("n_images") > 1)
      .orderBy(desc("n_images"), col("qr"), col("qg"), col("qb"))
  }

  /** Per-doc planted audio parameters (mirrored by the m5 oracle).
    * Sample i of n is `(id*31 + i*17) % 2003 - 1001` — a deterministic
    * integer waveform in [-1001, 1001].
    */
  private[graft] final case class PlantedAudio(id: Long) {
    val nSamples: Int = (id % 50 + 10).toInt
    val sampleRate: Int = (8000 + (id % 3) * 4000).toInt
    def sample(i: Int): Int = ((id * 31 + i * 17) % 2003 - 1001).toInt
  }

  /** Encode the planted waveform as a REAL 16-bit PCM mono WAV. */
  private[graft] def encodePlantedWav(id: Long): Array[Byte] = {
    val p = PlantedAudio(id)
    val dataBytes = p.nSamples * 2
    val buf = java.nio.ByteBuffer
      .allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(p.sampleRate)
      .putInt(p.sampleRate * 2)          // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes).putInt(dataBytes)
    var i = 0
    while (i < p.nSamples) { buf.putShort(p.sample(i).toShort); i += 1 }
    buf.array()
  }

  /** REAL audio decoder: javax.sound.sampled (JDK built-in). Parses the
    * container via AudioSystem, streams the PCM frames, and reduces to
    * (n_samples, sample_rate, Σ|s|, max|s|) — the per-file shape a
    * distributed audio-QA pass needs (exact integers, order-invariant).
    */
  object WavDecoder extends Serializable {
    case class AudioStats(nSamples: Int, sampleRate: Int, sumAbs: Long, peakAbs: Int)

    def decode(bytes: Array[Byte]): AudioStats = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"expected 16-bit mono PCM, got $fmt")
        val pcm = in.readAllBytes()
        var i = 0; var sum = 0L; var peak = 0
        while (i + 1 < pcm.length) {
          val s = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort.toInt
          val a = math.abs(s)
          sum += a
          if (a > peak) peak = a
          i += 2
        }
        AudioStats(pcm.length / 2, fmt.getSampleRate.toInt, sum, peak)
      } finally in.close()
    }

    /** Raw PCM sample stream (16-bit mono), for windowed feature
      * passes that need the samples themselves, not whole-file stats.
      */
    def decodeSamples(bytes: Array[Byte]): Array[Int] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"expected 16-bit mono PCM, got $fmt")
        val pcm = in.readAllBytes()
        val out = new Array[Int](pcm.length / 2)
        var i = 0
        while (i + 1 < pcm.length) {
          out(i / 2) = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort.toInt
          i += 2
        }
        out
      } finally in.close()
    }
  }

  /** Gated m5: encode planted WAVs distributed, decode them back with
    * the REAL javax.sound decoder, emit duration/amplitude statistics.
    * The sample values live only in the data chunk — recovering mean
    * |amplitude| and peak requires actually reading PCM frames.
    */
  def audioDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val decoded = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val s = WavDecoder.decode(encodePlantedWav(id))
          (id, s.nSamples, s.sampleRate, s.sumAbs, s.peakAbs)
        }
      }
      .toDF("doc_id", "n_samples", "sample_rate", "sum_abs", "peak_abs")
    decoded.select(
        col("doc_id"), col("n_samples"), col("sample_rate"),
        round(col("n_samples").cast("double") * lit(1000) / col("sample_rate"), 6)
          .as("duration_ms"),
        round(col("sum_abs").cast("double") / col("n_samples"), 6).as("mean_abs"),
        col("peak_abs"))
      .orderBy(col("doc_id"))
  }

  /** Feature-extraction pass: typed mapPartitions through the decoder
    * seam — one decoder instance per partition, rows streamed through
    * it. Exercised by ScalaTest (the decoder's output on non-media
    * payloads is deterministic but not SQL-expressible).
    */
  def extractFeatures(spark: SparkSession, dir: String,
                      decoder: Decoder = HybridDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    assetTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder init happens here, once per partition
        rows.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
  }

  /** Gated m7: windowed audio features — the per-window energy/peak
    * pass (VAD front-ends, loudness normalization, silence trimming)
    * over REAL decoded PCM. Each planted WAV decodes via javax.sound,
    * the sample stream cuts into 16-sample windows, and every window
    * emits exact integer sums (Σ|s|, Σs², max|s|) plus the RMS derived
    * by one division+sqrt at the end — the aggregation stays
    * order-invariant, the window index is the partition-friendly key.
    * The oracle states the same statistics from the planted waveform
    * formula.
    */
  def audioWindowStats(spark: SparkSession, dir: String, window: Int = 16): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val st = WavDecoder.decodeSamples(encodePlantedWav(id))
          st.grouped(window).zipWithIndex.map { case (ws, wi) =>
            var sa = 0L; var sq = 0L; var pk = 0
            ws.foreach { s =>
              val a = math.abs(s)
              sa += a; sq += a.toLong * a; if (a > pk) pk = a
            }
            (id, wi, ws.length, sa, sq, pk)
          }
        }
      }
      .toDF("doc_id", "win_idx", "n_samples", "sum_abs", "sum_sq", "peak_abs")
    rows.select(col("doc_id"), col("win_idx"),
        col("n_samples").cast("long").as("n_samples"),
        col("sum_abs"), col("peak_abs"),
        round(sqrt(col("sum_sq").cast("double") / col("n_samples").cast("double")), 6)
          .as("rms"))
      .orderBy(col("doc_id"), col("win_idx"))
  }

  /** Number of frames in the planted multi-frame asset for `id`
    * (mirrored by the m6 oracle), and the per-frame PNG seed.
    */
  private[graft] def plantedFrameCount(id: Long): Int = (id % 6 + 2).toInt
  private[graft] def plantedFrameSeed(id: Long, f: Int): Long = id * 131 + f

  /** Gated m6: frame sampling over a VIDEO-shaped column — each asset
    * is an `array<binary>` of real PNG frames (planted two-tone images
    * seeded per (doc, frame)). The pipeline is the real Spark plumbing
    * a frame-sampling pass needs at 100 TB:
    *   1. frames materialize as an array<binary> column;
    *   2. sampling is `posexplode` + a position predicate (every 2nd
    *      frame) — pure per-row generation, no shuffle;
    *   3. sampled frames decode via the REAL ImageIO path, emitting
    *      exact INTEGER channel sums (order-invariant, so the per-doc
    *      aggregation hash-matches regardless of partitioning);
    *   4. one division at the end produces the per-doc sampled-pixel
    *      means.
    * The oracle states the same statistics as doc_id/frame arithmetic.
    */
  def frameSampleStats(spark: SparkSession, dir: String, every: Int = 2): DataFrame = {
    import spark.implicits._
    val frames = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = plantedFrameCount(id)
          (id, (0 until n).map(f => encodePlantedPng(plantedFrameSeed(id, f))).toArray)
        }
      }
      .toDF("doc_id", "frames")
    val sampled = frames
      .select(col("doc_id"), size(col("frames")).as("n_frames"),
        posexplode(col("frames")))
      .filter(col("pos") % every === 0)
      .select(col("doc_id"), col("n_frames"), col("col").as("frame"))
      .as[(Long, Int, Array[Byte])]
    val stats = sampled
      .mapPartitions { rows =>
        rows.map { case (id, nf, bytes) =>
          val (w, h, sr, sg, sb) = ImageIODecoder.decodeSums(bytes)
            .getOrElse(sys.error(s"ImageIO failed to decode planted frame of doc $id"))
          (id, nf, w.toLong * h, sr, sg, sb)
        }
      }
      .toDF("doc_id", "n_frames", "np", "sr", "sg", "sb")
    stats
      .groupBy(col("doc_id"), col("n_frames"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("np")).as("np"), sum(col("sr")).as("sr"),
        sum(col("sg")).as("sg"), sum(col("sb")).as("sb"))
      .select(col("doc_id"), col("n_frames"), col("n_sampled"),
        round(col("sr").cast("double") / col("np").cast("double"), 6).as("mean_r"),
        round(col("sg").cast("double") / col("np").cast("double"), 6).as("mean_g"),
        round(col("sb").cast("double") / col("np").cast("double"), 6).as("mean_b"))
      .orderBy(col("doc_id"))
  }
}
