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

  /** A REAL (synthesized) minimal MP4/ISO-BMFF header as a column
    * expression: `ftyp` + a `moov` containing a version-0 `mvhd`
    * (timescale + duration) and one `trak`/`tkhd` (track dimensions as
    * 16.16 fixed point) — the box layout ISO/IEC 14496-12 §8.2 defines
    * and [[parseMp4Header]] walks. Codegen'd hex string ops, no UDF.
    */
  def syntheticMp4(timescale: Column, duration: Column,
                   width: Column, height: Column): Column = {
    // u32 range guard (r14 ADVICE): hex() of a value ≥ 2^32 is >8 chars
    // and lpad would TRUNCATE to the left 8 — a silently corrupt box
    // size, the opposite of the fail-loud doctrine for bad parameters.
    // coalesce(assert_true(...).cast, v) is the un-prunable guard shape
    // (q137): assert_true yields NULL when the range holds, so coalesce
    // returns v; out of range it throws in-plan.
    def be32(v: Column): Column = {
      val lv = v.cast("long")
      val guarded = coalesce(
        assert_true(lv >= 0L && lv <= 4294967295L,
          concat(lit("syntheticMp4: field out of u32 range: "),
            lv.cast("string"))).cast("long"),
        lv)
      lpad(hex(guarded), 8, "0")
    }
    val mvhd = concat(
      lit("0000006C"), lit("6D766864"), // size 108, "mvhd"
      lit("00000000"),                  // version 0 + flags
      lit("00000000"), lit("00000000"), // ctime, mtime
      be32(timescale), be32(duration),
      lit("00010000"), lit("0100"), lit("0000"), // rate 1.0, volume 1.0, reserved
      lit("0000000000000000"),          // reserved[8]
      lit("00010000000000000000000000000000"
        + "0001000000000000000000000000000040000000"), // unity matrix (36 B)
      lit("0000000000000000000000000000000000000000000000"
        + "00"),                        // pre_defined[24]
      lit("00000002"))                  // next_track_id
    val tkhd = concat(
      lit("0000005C"), lit("746B6864"), // size 92, "tkhd"
      lit("00000007"),                  // version 0 + enabled/in-movie/in-preview
      lit("00000000"), lit("00000000"), // ctime, mtime
      lit("00000001"), lit("00000000"), // track id, reserved
      be32(duration),
      lit("0000000000000000"),          // reserved[8]
      lit("0000"), lit("0000"), lit("0000"), lit("0000"), // layer, altgroup, volume, reserved
      lit("00010000000000000000000000000000"
        + "0001000000000000000000000000000040000000"), // unity matrix
      concat(lpad(hex(width.cast("long")), 4, "0"), lit("0000")),  // width 16.16
      concat(lpad(hex(height.cast("long")), 4, "0"), lit("0000"))) // height 16.16
    unhex(concat(
      lit("00000010"), lit("66747970"), lit("69736F6D"), lit("00000000"), // ftyp isom
      lit("000000D8"), lit("6D6F6F76"), // moov: 8 + 108 + (8 + 92)
      mvhd,
      lit("00000064"), lit("7472616B"), // trak: 8 + 92
      tkhd))
  }

  /** Media table whose payloads are real synthesized MP4 headers with
    * row-derived parameters (the q86 WAV doctrine on the video
    * modality) — [[decodeVideoMeta]] exercises the real box walker and
    * an external oracle verifies the parsed fields arithmetically.
    */
  def asMp4MediaTable(df: DataFrame, idCol: String, timescale: Column,
                      duration: Column, width: Column,
                      height: Column): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("video").as("media_type"),
      syntheticMp4(timescale, duration, width, height).as("payload"),
      width.cast("int").as("meta_width"),
      height.cast("int").as("meta_height"),
      (duration.cast("long") * 1000L / timescale.cast("long"))
        .as("meta_duration_ms"))

  /** Parse (timescale, duration, width, height) from a real MP4/
    * ISO-BMFF header (ISO/IEC 14496-12): top-level [u32 BE size][4cc]
    * box walk to `moov`, then its children to a version-0 `mvhd`
    * (timescale at +20, duration at +24 from the box start) and the
    * first `trak` whose `tkhd` carries 16.16-fixed track dimensions
    * (+84/+88 for version 0). None for anything malformed, version-1
    * (64-bit) headers included — the never-throws decode contract;
    * cursors walk as Long so an adversarial 2³¹-ish box size cannot
    * wrap the bounds check (the WAV lesson).
    */
  private[ops] def parseMp4Header(p: Array[Byte]): Option[(Int, Long, Int, Int)] = {
    if (p == null || p.length < 16) return None
    def boxAt(i: Long, end: Long): Option[(String, Long, Long)] = {
      if (i + 8 > end) None
      else {
        val size = be32(p, i.toInt).toLong & 0xFFFFFFFFL
        if (size < 8 || i + size > end) None
        else Some((new String(p, i.toInt + 4, 4, "US-ASCII"), i + 8, i + size))
      }
    }
    // top level: find moov
    var i = 0L
    var moov: Option[(Long, Long)] = None
    while (moov.isEmpty) {
      boxAt(i, p.length.toLong) match {
        case Some(("moov", body, boxEnd)) => moov = Some((body, boxEnd))
        case Some((_, _, boxEnd)) => i = boxEnd
        case None => return None
      }
    }
    val (mBody, mEnd) = moov.get
    var ts = -1; var dur = -1L; var w = -1; var h = -1
    var j = mBody
    while (j < mEnd && (ts < 0 || w < 0)) {
      boxAt(j, mEnd) match {
        case Some(("mvhd", body, boxEnd)) =>
          if (p(body.toInt) != 0) return None // version 1 (64-bit): unsupported
          if (body + 28 > boxEnd) return None
          ts = be32(p, body.toInt + 12)
          dur = be32(p, body.toInt + 16).toLong & 0xFFFFFFFFL
          j = boxEnd
        case Some(("trak", body, boxEnd)) =>
          var k = body
          while (k < boxEnd && w < 0) {
            boxAt(k, boxEnd) match {
              case Some(("tkhd", tb, tEnd)) =>
                if (p(tb.toInt) != 0) return None
                if (tb + 84 > tEnd) return None
                w = be32(p, tb.toInt + 76) >>> 16
                h = be32(p, tb.toInt + 80) >>> 16
                k = tEnd
              case Some((_, _, bEnd)) => k = bEnd
              case None => return None
            }
          }
          j = boxEnd
        case Some((_, _, boxEnd)) => j = boxEnd
        case None => return None
      }
    }
    if (ts <= 0 || dur < 0 || w < 0 || h < 0) None
    else Some((ts, dur, w, h))
  }

  private val videoSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Video-metadata extraction over partition-local batches — narrow,
    * no shuffle, payload bytes dropped on output; unparseable payloads
    * come back zeroed (never-throws at scale). duration_ms is the
    * integer `duration·1000/timescale` an external oracle replays.
    */
  def decodeVideoMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(videoSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val (ts, dur, w, h) = parseMp4Header(payload).getOrElse((0, 0L, 0, 0))
          val durMs = if (ts > 0) dur * 1000L / ts else 0L
          Row(id, ts, durMs, w, h, payload.length.toLong)
        }
      }(enc)
  }

  /** [[syntheticMp4]]'s byte-level twin for payloads that also carry
    * FRAME DATA: the same ftyp+moov header followed by an `mdat` box
    * of `nFrames` raw w×h grayscale frames (row-major bytes) — the
    * simplest container layout that lets frame-sampling be a SEEK, not
    * a decode (frame k starts at mdatStart + k·w·h).
    */
  private[ops] def mp4WithFramesBytes(timescale: Int, w: Int, h: Int,
                                      frames: Array[Array[Int]]): Array[Byte] = {
    def box(tag: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length); bb.put(tag.getBytes("US-ASCII"))
      bb.put(payload); bb.array()
    }
    val unity = Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    val mvhd = java.nio.ByteBuffer.allocate(100)
    mvhd.putInt(0).putInt(0).putInt(0) // ver/flags, ctime, mtime
      .putInt(timescale).putInt(frames.length) // duration = nFrames ticks
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      .putLong(0L)
    unity.foreach(mvhd.putInt); (0 until 6).foreach(_ => mvhd.putInt(0))
    mvhd.putInt(2)
    val tkhd = java.nio.ByteBuffer.allocate(84)
    tkhd.putInt(7).putInt(0).putInt(0).putInt(1).putInt(0)
      .putInt(frames.length).putLong(0L)
      .putShort(0).putShort(0).putShort(0).putShort(0)
    unity.foreach(tkhd.putInt)
    tkhd.putInt(w << 16).putInt(h << 16)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0))
    val moov = box("moov", box("mvhd", mvhd.array()) ++ box("trak", box("tkhd", tkhd.array())))
    val mdat = box("mdat", frames.flatMap(_.map(v => (v & 0xFF).toByte)))
    ftyp ++ moov ++ mdat
  }

  /** Media table of frame-carrying MP4s: `pixels` is the flattened
    * nFrames·w·h grayscale values (a declarative Column formula — the
    * oracle-replayable synthesis contract of the whole media family).
    */
  def asMp4FramesMediaTable(df: DataFrame, idCol: String, timescale: Int,
                            w: Int, h: Int, nFrames: Int,
                            pixels: Column): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    ScanFanOut(df)
      .select(col(idCol).cast("long").as("media_id"),
        pixels.cast(ArrayType(IntegerType)).as("px"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val px = r.getSeq[Int](1).toArray
          require(px.length == nFrames * w * h,
            s"pixel count ${px.length} != $nFrames x $w x $h")
          val frames = Array.tabulate(nFrames)(f =>
            px.slice(f * w * h, (f + 1) * w * h))
          Row(id, "video", mp4WithFramesBytes(timescale, w, h, frames),
            w, h, frames.length.toLong * 1000L / timescale)
        }
      }(enc)
  }

  /** Locate the mdat payload span: (start, end) byte offsets. */
  private def findMdat(p: Array[Byte]): Option[(Int, Int)] = {
    var i = 0L
    while (i + 8 <= p.length) {
      val size = be32(p, i.toInt).toLong & 0xFFFFFFFFL
      if (size < 8 || i + size > p.length) return None
      if (p(i.toInt + 4) == 'm' && p(i.toInt + 5) == 'd' &&
          p(i.toInt + 6) == 'a' && p(i.toInt + 7) == 't')
        return Some(((i + 8).toInt, (i + size).toInt))
      i += size
    }
    None
  }

  private val frameHashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** FRAME SAMPLING + per-frame perceptual hash: every `everyN`-th
    * frame of each payload is sliced out of the mdat (a partition-local
    * SEEK — unsampled frames are never materialized, which is the point
    * of sampling) and dHashed with the same [[dhash64]] the image path
    * uses. Output: (media_id, frame_idx, dhash); undecodable payloads
    * contribute no rows (never-throws). Temporal dedup / scene-cut
    * detection follows by pairing dhashes — [[graft.ops.Dedup.hammingPairs]]
    * on the (media_id·2³²+frame) key, or a lag() compare per media for
    * cut detection.
    */
  def videoFrameDHash(media: DataFrame, everyN: Int = 1): DataFrame = {
    require(everyN >= 1)
    val enc = org.apache.spark.sql.Encoders.row(frameHashSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          (for {
            p <- Option(payload)
            (_, _, w, h) <- parseMp4Header(p)
            if w > 0 && h > 0
            (s, e) <- findMdat(p)
          } yield {
            val frameBytes = w * h
            val nFrames = (e - s) / frameBytes
            (0 until nFrames by everyN).map { f =>
              val g = new Array[Int](frameBytes)
              var k = 0
              while (k < frameBytes) {
                g(k) = p(s + f * frameBytes + k) & 0xFF; k += 1
              }
              Row(id, f, dhash64(w, h, g))
            }
          }).getOrElse(Seq.empty)
        }
      }(enc)
  }

  /** [[dhash64]] over Long samples — the video fold accumulates frame
    * sums, whose comparisons are what the hash reads; Long keeps the
    * accumulation exact out to ~3.6·10¹⁶ summed luminance (255 per
    * frame × everyN-sampled frame count), far past any real clip.
    */
  private[ops] def dhash64L(w: Int, h: Int, g: Array[Long]): Long = {
    var sh = 0L
    var y = 0
    while (y < 8) {
      val gy = y * h / 8
      var x = 0
      while (x < 8) {
        val l = g(gy * w + x * w / 9)
        val r = g(gy * w + (x + 1) * w / 9)
        if (l < r) sh |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    sh
  }

  private val vfpSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("vfp", LongType, nullable = true)))

  /** Per-payload VIDEO perceptual fingerprint (r20, r19 verdict #1 —
    * video into the near-dup curation loop): every `everyN`-th frame is
    * sliced out of the mdat (the [[videoFrameDHash]] seek, unsampled
    * frames never materialized), the sampled frames are folded into ONE
    * per-position luminance SUM (order-free, exact integer — the
    * temporal-mean frame without the division), and the fold is dHashed
    * ([[dhash64L]] — same grid compare the image path uses). A
    * near-duplicate clip (re-encoded, a few perturbed pixels, a
    * dropped tail frame under sampling) moves a handful of summed
    * positions and therefore a handful of hash bits — exactly the
    * Hamming-radius contract [[graft.ops.Dedup.hammingPairs]] consumes.
    * Narrow per-partition map; video bytes never shuffle; (media_id,
    * vfp) with null for undecodable payloads (never-throws).
    */
  /** The per-payload kernel behind [[videoFingerprints]] — also the
    * video leg of the single-pass [[mediaFingerprints]] dispatch. */
  private def videoFp64(payload: Array[Byte], everyN: Int): Option[Long] =
    for {
      p <- Option(payload)
      (_, _, w, h) <- parseMp4Header(p)
      if w > 0 && h > 0
      (s, e) <- findMdat(p)
      frameBytes = w * h
      nFrames = (e - s) / frameBytes
      if nFrames > 0
    } yield {
      val acc = new Array[Long](frameBytes)
      var f = 0
      while (f < nFrames) {
        var k = 0
        while (k < frameBytes) {
          acc(k) += (p(s + f * frameBytes + k) & 0xFF).toLong
          k += 1
        }
        f += everyN
      }
      dhash64L(w, h, acc)
    }

  def videoFingerprints(media: DataFrame, everyN: Int = 1): DataFrame = {
    require(everyN >= 1)
    val enc = org.apache.spark.sql.Encoders.row(vfpSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(id, videoFp64(payload, everyN).map(Long.box).orNull)
        }
      }(enc)
  }

  /** Perceptual near-duplicate video pairs: fingerprint each payload,
    * then Hamming-radius pairing — the machinery's third consumer,
    * completing the image/audio/video triple. Only (media_id, vfp)
    * longs enter the exchange; frames and payloads stay
    * partition-local.
    */
  def videoNearDupPairs(media: DataFrame, maxHamming: Int = 4,
                        everyN: Int = 1): DataFrame =
    Dedup.hammingPairs(
      videoFingerprints(media, everyN).filter(col("vfp").isNotNull),
      "media_id", "vfp", maxHamming)

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

  // --------------------------------------------------------------------
  // Full-pixel PNG codec + perceptual hashing (r13). Dependency-free:
  // PNG's pixel stream is zlib (java.util.zip Inflater/Deflater) under
  // five per-scanline byte filters (ISO 15948 §9) — a complete decode
  // path for the formats this pipeline synthesizes and for any
  // well-formed 8-bit gray/truecolor non-interlaced PNG at scale.
  // --------------------------------------------------------------------

  private[ops] def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val tb = tag.getBytes("US-ASCII")
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length); bb.put(tb); bb.put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Encode grayscale pixels (row-major, 0-255) as a complete, valid
    * 8-bit color-type-0 PNG — real CRCs, real zlib IDAT. Scanline
    * filters alternate None/Up so the decoder's unfilter path is
    * genuinely exercised, not just pass-through.
    */
  private[ops] def encodeGrayPng(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h, s"pixel count ${px.length} != $w x $h")
    val raw = new java.io.ByteArrayOutputStream(h * (w + 1))
    val prev = new Array[Int](w)
    var y = 0
    while (y < h) {
      val filter = if (y % 2 == 1) 2 else 0 // alternate None / Up
      raw.write(filter)
      var x = 0
      while (x < w) {
        val v = px(y * w + x) & 0xFF
        raw.write(if (filter == 2) (v - prev(x)) & 0xFF else v)
        prev(x) = v
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte) // depth 8, gray
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    val out = new java.io.ByteArrayOutputStream()
    out.write(sig)
    out.write(pngChunk("IHDR", ihdr))
    out.write(pngChunk("IDAT", zOut.toByteArray))
    out.write(pngChunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }

  /** Full PNG pixel decode to grayscale: signature + chunk walk (IDAT
    * segments concatenate), zlib inflate, per-scanline unfilter (all
    * five filters incl. Paeth), 8-bit gray (type 0) or truecolor
    * (type 2, integer ITU-R 601 luma (299r+587g+114b)/1000). None for
    * anything else — the never-throws contract of the decode layer.
    */
  private[ops] def decodePngGray(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (p == null || p.length < 41) return None
    if (!((p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
          p(4) == 0x0D && p(5) == 0x0A && p(6) == 0x1A && p(7) == 0x0A)) return None
    var w = 0; var h = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var done = false
    while (!done && i + 8 <= p.length) {
      val len = be32(p, i)
      if (len < 0 || i + 12 + len > p.length) return None
      val tag = new String(p, i + 4, 4, "US-ASCII")
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(p, i + 8); h = be32(p, i + 12)
          val depth = p(i + 16) & 0xFF
          colorType = p(i + 17) & 0xFF
          val interlace = p(i + 20) & 0xFF
          if (depth != 8 || (colorType != 0 && colorType != 2) ||
              interlace != 0) return None
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
        case "IDAT" => idat.write(p, i + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk: skip
      }
      i += 12 + len
    }
    if (colorType < 0 || idat.size() == 0) return None
    val bpp = if (colorType == 2) 3 else 1
    val stride = w * bpp
    val rawLen = h * (1 + stride)
    val raw = new Array[Byte](rawLen)
    // inf.end() in finally: every early exit (truncated stream, length
    // mismatch, DataFormatException) must release the native zlib
    // buffers — a corpus scan hitting many corrupt payloads (exactly
    // the never-throws contract's target case) would otherwise
    // accumulate native memory per executor until finalization
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, off, rawLen - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off != rawLen) return None
    } catch { case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // unfilter in place (ISO 15948 §9.2): Recon(x) from the filter byte
    val cur = new Array[Int](stride)
    val prior = new Array[Int](stride)
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + stride)
      val filter = raw(rowOff) & 0xFF
      var x = 0
      while (x < stride) {
        val f = raw(rowOff + 1 + x) & 0xFF
        val a = if (x >= bpp) cur(x - bpp) else 0      // left
        val b = if (y > 0) prior(x) else 0             // up
        val c = if (x >= bpp && y > 0) prior(x - bpp) else 0 // up-left
        val recon = filter match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + (a + b) / 2
          case 4 =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            f + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        cur(x) = recon & 0xFF
        x += 1
      }
      var px = 0
      while (px < w) {
        gray(y * w + px) =
          if (bpp == 1) cur(px)
          else (cur(px * 3) * 299 + cur(px * 3 + 1) * 587 +
            cur(px * 3 + 2) * 114) / 1000
        px += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    Some((w, h, gray))
  }

  /** 64-bit difference hash (dHash) over a grayscale image: box-sample
    * to a 9x8 grid (top-left nearest — integer index math an external
    * oracle can replay), bit `y*8+x` set iff grid(x,y) < grid(x+1,y).
    * A 9x8 source is used as-is, so the hash is an exact integer
    * function of the pixels.
    */
  private[ops] def dhash64(w: Int, h: Int, g: Array[Int]): Long = {
    var sh = 0L
    var y = 0
    while (y < 8) {
      val gy = y * h / 8
      var x = 0
      while (x < 8) {
        val l = g(gy * w + x * w / 9)
        val r = g(gy * w + (x + 1) * w / 9)
        if (l < r) sh |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    sh
  }

  /** Media table whose payloads are complete synthesized PNGs carrying
    * caller-provided grayscale pixels (row-major ints 0-255) — the
    * pixel values stay a declarative Column expression, so an external
    * oracle can recompute everything downstream of the codec
    * arithmetically while the Spark side round-trips real bytes.
    */
  def asGrayPngMediaTable(df: DataFrame, idCol: String,
                          width: Int, height: Int,
                          pixels: Column): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    // fan out BEFORE the pixel formula evaluates: the formula (a
    // per-row HOF over the pixel grid), the encode kernel, and every
    // decode kernel downstream are one narrow chain from this scan, so
    // a few-file input serializes the whole codec onto one core
    // (measured: q147's chain ran 2.7 s single-task at sf0.1, and a
    // first fix that fanned out AFTER the projection moved nothing —
    // the HOF still evaluated upstream of the exchange). Fanning the
    // INPUT out lets ColumnPruning trim the exchange to the referenced
    // source columns and the formula runs post-exchange, full-width.
    // Media BYTES still never shuffle (the doctrine); at real scale
    // media arrives thousands-of-splits wide and the conf disables
    // this.
    ScanFanOut(df)
      .select(col(idCol).cast("long").as("media_id"),
        pixels.cast(ArrayType(IntegerType)).as("px"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val px = r.getSeq[Int](1).toArray
          Row(id, "image", encodeGrayPng(width, height, px),
            width, height, null)
        }
      }(enc)
  }

  private val dhashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("dhash", LongType, nullable = true)))

  /** Per-image perceptual hash: full PNG pixel decode → [[dhash64]].
    * Narrow per-partition map — media bytes never shuffle; the output
    * is (media_id, dhash), dhash null for undecodable payloads (the
    * never-throws contract; filter or count nulls for observability).
    */
  def imageDHash(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(dhashSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val dh = decodePngGray(payload)
            .map { case (w, h, g) => dhash64(w, h, g) }
          Row(id, dh.map(Long.box).orNull)
        }
      }(enc)
  }

  /** Perceptual near-duplicate image pairs: dHash each image, then
    * Hamming-radius pairing via the simhash chunk-blocking machinery
    * ([[graft.ops.Dedup.hammingPairs]] — complete by pigeonhole for the
    * radii perceptual dedup uses, ≤ 15). Only (media_id, dhash) longs
    * enter the exchange; pixels and payloads stay partition-local.
    * Undecodable payloads are excluded (null dhash).
    */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 4): DataFrame =
    Dedup.hammingPairs(
      imageDHash(media).filter(col("dhash").isNotNull),
      "media_id", "dhash", maxHamming)

  // --------------------------------------------------------------------
  // PCM WAV codec + audio perceptual fingerprint (r14). The audio twin
  // of the PNG/dHash path: real RIFF payloads carrying 16-bit mono PCM
  // whose sample values stay a declarative Column formula (so an
  // external oracle replays everything downstream arithmetically), a
  // full decode back to samples, and a frame-energy difference
  // fingerprint paired via the same hammingPairs machinery.
  // --------------------------------------------------------------------

  /** Media table whose payloads are complete 16-bit mono PCM WAVs
    * carrying caller-provided samples (array<int>, clamped to the
    * signed 16-bit range at encode). Header is the canonical 44-byte
    * RIFF/fmt/data layout [[parseWavHeader]] walks; samples are
    * little-endian per RIFF.
    */
  def asPcmWavMediaTable(df: DataFrame, idCol: String, sampleRate: Int,
                         samples: Column): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    // fan-out before the sample formula evaluates — see
    // asGrayPngMediaTable for the placement lesson
    ScanFanOut(df)
      .select(col(idCol).cast("long").as("media_id"),
        samples.cast(ArrayType(IntegerType)).as("pcm"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val pcm = r.getSeq[Int](1).toArray
          Row(id, "audio", encodePcmWav(sampleRate, pcm),
            null, null, pcm.length.toLong * 1000L / sampleRate)
        }
      }(enc)
  }

  private[ops] def encodePcmWav(sampleRate: Int, pcm: Array[Int]): Array[Byte] = {
    val dataLen = pcm.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1.toShort).putShort(1.toShort) // PCM, mono
    bb.putInt(sampleRate).putInt(sampleRate * 2)
    bb.putShort(2.toShort).putShort(16.toShort) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    pcm.foreach(s => bb.putShort(math.max(-32768, math.min(32767, s)).toShort))
    bb.array()
  }

  /** Full PCM decode: RIFF chunk walk to "fmt " (must be PCM, 16-bit,
    * mono) and "data", signed little-endian samples back as ints. None
    * for anything malformed (never-throws contract); a data size past
    * the payload end is truncated to what is actually present (a
    * storage-truncated file should still fingerprint, not vanish).
    */
  private[ops] def decodeWavPcm(p: Array[Byte]): Option[Array[Int]] = {
    if (p == null || p.length < 44 ||
        !(p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') ||
        !(p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')) return None
    var fmtOk = false
    var i = 12L
    while (i + 8 <= p.length) {
      val ii = i.toInt
      val size = le32(p, ii + 4)
      if (size < 0) return None
      val tag = new String(p, ii, 4, "US-ASCII")
      if (tag == "fmt ") {
        if (size < 16 || i + 8 + 16 > p.length) return None
        if (le16(p, ii + 8) != 1 || le16(p, ii + 10) != 1 ||
            le16(p, ii + 22) != 16) return None
        fmtOk = true
      } else if (tag == "data") {
        if (!fmtOk) return None // fmt must precede data per spec order
        val avail = p.length - (ii + 8)
        val n = math.min(size, avail) / 2
        val out = new Array[Int](n)
        var k = 0
        while (k < n) {
          out(k) = (le16(p, ii + 8 + k * 2) << 16) >> 16 // sign-extend
          k += 1
        }
        return Some(out)
      }
      i += 8L + size.toLong + (size & 1)
    }
    None
  }

  /** 64-bit frame-energy difference fingerprint over PCM samples (the
    * dHash rule transplanted to audio): the stream is cut into 65
    * frames by integer boundaries (frame j = samples [j·n/65,
    * (j+1)·n/65)), each frame's energy is the exact integer sum of
    * |sample|, and bit j is set iff e(j) < e(j+1) — a pure integer
    * function of the samples an external oracle replays exactly.
    * Robust to uniform gain (energy ratios preserved under clipping-
    * free scaling) and to small edits (one changed sample moves one
    * frame's energy → ≤ 2 bits flip).
    */
  private[ops] def audioFingerprint64(pcm: Array[Int]): Long = {
    val n = pcm.length
    val e = new Array[Long](65)
    var j = 0
    while (j < 65) {
      // boundaries in Long: j·n at j=64 overflows Int past ~33M samples
      // (a ~12-minute 44.1 kHz WAV — realistic in a crawl corpus) and a
      // negative index would throw inside the scan, violating the
      // never-throws decode contract (r14 ADVICE)
      val lo = (j.toLong * n / 65).toInt
      val hi = ((j + 1).toLong * n / 65).toInt
      var s = 0L
      var k = lo
      while (k < hi) { s += math.abs(pcm(k).toLong); k += 1 }
      e(j) = s
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (e(b) < e(b + 1)) fp |= 1L << b
      b += 1
    }
    fp
  }

  private val afpSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("afp", LongType, nullable = true)))

  /** Per-payload audio fingerprint: full PCM decode →
    * [[audioFingerprint64]]. Narrow per-partition map — audio bytes
    * never shuffle; output is (media_id, afp), null for undecodable
    * or empty payloads.
    */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(afpSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val fp = decodeWavPcm(payload).filter(_.nonEmpty)
            .map(audioFingerprint64)
          Row(id, fp.map(Long.box).orNull)
        }
      }(enc)
  }

  /** Perceptual near-duplicate audio pairs: fingerprint each payload,
    * then Hamming-radius pairing via [[graft.ops.Dedup.hammingPairs]]
    * (the machinery's second consumer, exactly what its text-decoupling
    * existed for). Only (media_id, afp) longs enter the exchange;
    * samples and payloads stay partition-local.
    */
  def audioNearDupPairs(media: DataFrame, maxHamming: Int = 4): DataFrame =
    Dedup.hammingPairs(
      audioFingerprints(media).filter(col("afp").isNotNull),
      "media_id", "afp", maxHamming)

  /** MIME-routed perceptual fingerprints for a mixed-payload media
    * frame (r19 — the q194 front half as ONE reusable stage): sniff
    * each payload's container on bytes alone ([[Mime.sniffMime]] —
    * production media arrives untagged), route PNGs to the pixel
    * decode → dHash kernel, WAVs to the PCM decode → frame-energy
    * kernel, and MP4s to the frame-fold → dHash kernel
    * ([[videoFingerprints]] — r20, closing the video gap: a video
    * payload entering the curation loop is fingerprinted and deduped
    * like any other modality, not silently dropped), drop everything
    * else (text and unknown containers carry no perceptual identity).
    * Output (media_id, kind, fp) — 8-byte fingerprints tagged by
    * modality so downstream pairing never crosses fingerprint spaces.
    * Payload bytes never survive this stage: the whole dispatch is ONE
    * narrow partition-local map and only the (id, kind, fp) longs
    * reach any exchange — the media doctrine.
    *
    * SINGLE PASS (r20): the first cut was a 3-way union of
    * mime-filtered kernel scans, and because the mime predicate sits
    * on the PAYLOAD it cannot push into the source — every modality
    * branch re-evaluated the entire upstream (measured on the q194
    * fixture: the synthesis ran once per modality, 3x the decode
    * stage's true cost, and each new modality would add another full
    * pass). The byte-level sniff ([[Mime.sniffMimeBytes]] — the
    * Column chain's spec-pinned twin) moves the dispatch inside the
    * kernel: one scan, per-row route, identical output.
    */
  def mediaFingerprints(media: DataFrame, videoEveryN: Int = 1): DataFrame = {
    require(videoEveryN >= 1)
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("fp", LongType, nullable = false))))
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val routed: Option[(String, Long)] = Mime.sniffMimeBytes(p) match {
            case "image/png" =>
              decodePngGray(p).map { case (w, h, g) =>
                ("image", dhash64(w, h, g)) }
            case "audio/wav" =>
              decodeWavPcm(p).filter(_.nonEmpty)
                .map(s => ("audio", audioFingerprint64(s)))
            case "video/mp4" =>
              videoFp64(p, videoEveryN).map(("video", _))
            case _ => None
          }
          routed.map { case (k, fp) => Row(id, k, fp) }
        }
      }(enc)
  }

  /** Per-modality incremental Hamming pairing over
    * [[mediaFingerprints]] frames: the batch delta against a STANDING
    * fingerprint table, per kind (image fingerprints never pair with
    * audio fingerprints — distinct spaces). Folding batch deltas
    * reproduces the one-shot q194 pair set
    * ([[graft.ops.Dedup.hammingPairsIncremental]]'s contract), so a
    * streaming ingest maintains the same near-dup labeling the nightly
    * batch run would compute.
    */
  def mediaPairsIncremental(newFps: DataFrame, standingFps: DataFrame,
                            maxHamming: Int = 4): DataFrame =
    Dedup.hammingPairsIncremental(newFps, standingFps, "media_id", "fp",
      maxHamming, blockCols = Seq("kind"))
}
