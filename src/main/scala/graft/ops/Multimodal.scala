package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The decode kernel parses real image headers — PNG IHDR and JPEG
  * SOF0/1/2 frame headers are dependency-free big-endian reads — and
  * falls back to deterministic byte statistics for payloads that are
  * not a recognized image (the "opaque blob" path: the pipeline must
  * not die on a corrupt or foreign payload at row 10^9 of a 100 TB
  * scan). Full pixel decode (IDAT inflate, DCT) would need codec libs;
  * the header carries everything the metadata pipeline consumes.
  *
  * At 100 TB the shape matters: media bytes never enter a shuffle —
  * decode/feature-extract is a narrow per-partition map, and only the
  * small feature/metadata columns flow downstream.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true),
    StructField("meta_duration_ms", LongType, nullable = true)))

  /** Wrap an arbitrary table into the media schema (test harness: text
    * bytes stand in for media payloads).
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("media_type"),
      col(textCol).cast("binary").as("payload"),
      lit(null).cast("int").as("meta_width"),
      lit(null).cast("int").as("meta_height"),
      lit(null).cast("long").as("meta_duration_ms"))

  /** A REAL (synthesized) PNG payload as a column expression: the 8-byte
    * PNG signature plus a well-formed IHDR chunk carrying the given
    * dimensions, 8-bit truecolor (3 channels). Built from codegen'd hex
    * string ops — no UDF. The CRC bytes are left zero (header parsers,
    * including [[parseImageHeader]], don't checksum), and there is no
    * IDAT: this is the header-complete prefix a metadata pipeline reads.
    */
  def syntheticPng(width: Column, height: Column): Column =
    unhex(concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D"),         // IHDR data length = 13
      lit("49484452"),         // "IHDR"
      lpad(hex(width.cast("long")), 8, "0"),
      lpad(hex(height.cast("long")), 8, "0"),
      lit("0802000000"),       // bit depth 8, color type 2 (truecolor), compression/filter/interlace 0
      lit("00000000")))        // CRC placeholder

  /** Media table whose payloads are real synthesized PNGs with
    * row-derived dimensions — [[decodeFeatures]] then exercises the real
    * header parser, and an external oracle can verify the decoded
    * dimensions arithmetically from the source columns.
    */
  def asPngMediaTable(df: DataFrame, idCol: String,
                      width: Column, height: Column): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("media_type"),
      syntheticPng(width, height).as("payload"),
      width.cast("int").as("meta_width"),
      height.cast("int").as("meta_height"),
      lit(null).cast("long").as("meta_duration_ms"))

  /** Little-endian hex encodings of a numeric column, for synthesizing
    * RIFF-family payloads with codegen'd string ops (no UDF).
    */
  private def le16Hex(v: Column): Column = {
    val x = v.cast("long")
    concat(
      lpad(hex(pmod(x, lit(256L))), 2, "0"),
      lpad(hex(pmod(shiftright(x, 8), lit(256L))), 2, "0"))
  }

  private def le32Hex(v: Column): Column = {
    val x = v.cast("long")
    concat(
      lpad(hex(pmod(x, lit(256L))), 2, "0"),
      lpad(hex(pmod(shiftright(x, 8), lit(256L))), 2, "0"),
      lpad(hex(pmod(shiftright(x, 16), lit(256L))), 2, "0"),
      lpad(hex(pmod(shiftright(x, 24), lit(256L))), 2, "0"))
  }

  /** A REAL (synthesized) canonical 44-byte PCM WAV header as a column
    * expression: RIFF/WAVE + "fmt " subchunk (PCM, 16-bit) + empty
    * "data" chunk. All multi-byte fields little-endian per RIFF.
    */
  def syntheticWav(sampleRate: Column, channels: Column): Column = {
    val sr = sampleRate.cast("long")
    val ch = channels.cast("long")
    unhex(concat(
      lit("52494646"),          // "RIFF"
      le32Hex(lit(36L)),        // riff size = 36 + data size (0)
      lit("57415645"),          // "WAVE"
      lit("666D7420"),          // "fmt "
      le32Hex(lit(16L)),        // fmt chunk size
      le16Hex(lit(1L)),         // audio format 1 = PCM
      le16Hex(ch),
      le32Hex(sr),
      le32Hex(sr * ch * 2L),    // byte rate (16-bit samples)
      le16Hex(ch * 2L),         // block align
      le16Hex(lit(16L)),        // bits per sample
      lit("64617461"),          // "data"
      le32Hex(lit(0L))))        // data size
  }

  /** Media table whose payloads are real synthesized WAV headers with
    * row-derived parameters — [[decodeAudioMeta]] then exercises the
    * real RIFF chunk walker, and an external oracle verifies the parsed
    * fields arithmetically from the source columns (the q34 pattern).
    */
  def asWavMediaTable(df: DataFrame, idCol: String,
                      sampleRate: Column, channels: Column): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("audio").as("media_type"),
      syntheticWav(sampleRate, channels).as("payload"),
      lit(null).cast("int").as("meta_width"),
      lit(null).cast("int").as("meta_height"),
      lit(null).cast("long").as("meta_duration_ms"))

  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xFF) << 24) | ((p(i + 1) & 0xFF) << 16) |
      ((p(i + 2) & 0xFF) << 8) | (p(i + 3) & 0xFF)

  private def be16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)

  /** Parse (width, height, channels) from a real image header; None if
    * the payload is not a recognized image.
    *
    *  - PNG (ISO 15948 §5.2/§11.2.2): 8-byte signature, then the IHDR
    *    chunk is REQUIRED first — width/height as big-endian u32 at
    *    offsets 16/20, color type at 25 (0 gray, 2 truecolor, 3 palette,
    *    4 gray+alpha, 6 RGBA).
    *  - JPEG (ITU T.81 §B): FF D8 then marker segments; walk lengths to
    *    the first SOFn (C0-CF except C4/C8/CC): [len][precision]
    *    [height u16][width u16][n components].
    */
  private[ops] def parseImageHeader(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (p.length >= 26 &&
        (p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
        p(4) == 0x0D && p(5) == 0x0A && p(6) == 0x1A && p(7) == 0x0A &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R') {
      val channels = (p(25) & 0xFF) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return None
      }
      Some((be32(p, 16), be32(p, 20), channels))
    } else if (p.length >= 4 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i + 3 < p.length) {
        if ((p(i) & 0xFF) != 0xFF) return None // marker desync: not a JPEG we can walk
        val marker = p(i + 1) & 0xFF
        if (marker == 0xFF) { i += 1 } // fill byte
        else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) { i += 2 } // standalone
        else {
          val len = be16(p, i + 2)
          if (len < 2) return None
          val isSof = marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof) {
            if (i + 9 >= p.length) return None
            return Some((be16(p, i + 7), be16(p, i + 5), p(i + 9) & 0xFF))
          }
          i += 2 + len
        }
      }
      None
    } else None
  }

  private def le32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8) |
      ((p(i + 2) & 0xFF) << 16) | ((p(i + 3) & 0xFF) << 24)

  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)

  /** Parse (sampleRate, channels, bitsPerSample) from a real WAV
    * header (RIFF spec / RFC 2361): "RIFF"[size]"WAVE", then chunks
    * walked by [fourcc][u32 LE size] to the "fmt " chunk — format
    * 1 (PCM) or 3 (IEEE float), fields at fixed LE offsets. Chunk
    * sizes are word-aligned on the walk. None for anything malformed.
    */
  private[ops] def parseWavHeader(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (p.length < 36 ||
        !(p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') ||
        !(p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')) None
    else {
      // cursor walked as Long: a garbage chunk size near Int.MaxValue
      // would wrap `i + 8 + size + pad` negative as an Int, re-pass the
      // bounds guard, and throw on p(i) — one adversarial RIFF payload
      // must not kill a 100 TB scan (never-throws contract)
      var i = 12L
      while (i + 8 <= p.length) {
        val ii = i.toInt
        val size = le32(p, ii + 4)
        if (size < 0) return None
        if (p(ii) == 'f' && p(ii + 1) == 'm' && p(ii + 2) == 't' && p(ii + 3) == ' ') {
          if (size < 16 || i + 8 + 16 > p.length) return None
          val fmt = le16(p, ii + 8)
          if (fmt != 1 && fmt != 3) return None
          return Some((le32(p, ii + 12), le16(p, ii + 10), le16(p, ii + 22)))
        }
        i += 8L + size.toLong + (size & 1)
      }
      None
    }
  }

  private val audioSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Audio-metadata extraction over partition-local batches — narrow,
    * no shuffle, payload bytes dropped on output; unparseable payloads
    * come back zeroed (never-throws at scale).
    */
  def decodeAudioMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val (sr, ch, bits) = parseWavHeader(payload).getOrElse((0, 0, 0))
          Row(id, sr, ch, bits, payload.length.toLong)
        }
      }(enc)
  }

  /** Decode kernel: real header parse, with a deterministic byte-stat
    * fallback for unrecognized payloads (pseudo-dimensions from the
    * first/last byte — stable test expectations for text-as-media
    * fixtures, and a never-throws path for corrupt media at scale).
    * The 8-bucket byte histogram stands in for a feature vector in both
    * paths.
    */
  private def decodeKernel(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    if (payload == null || payload.isEmpty) (0, 0, 0, Array.empty[Float])
    else {
      val n = payload.length
      val hist = new Array[Float](8)
      payload.foreach(b => hist((b & 0xFF) / 32) += 1f)
      val feats = hist.map(_ / n)
      parseImageHeader(payload) match {
        case Some((w, h, c)) => (w, h, c, feats)
        case None =>
          (16 + (math.abs(payload(0).toInt) % 64),
            16 + (math.abs(payload(n - 1).toInt) % 64), 3, feats)
      }
    }
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Decode + feature-extract over partition-local batches. Narrow
    * transformation: no shuffle, media bytes are dropped on output.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val (w, h, c, feat) = decodeKernel(payload)
          Row(id, w, h, c, payload.length.toLong, feat.toSeq)
        }
      }(enc)
  }
}
