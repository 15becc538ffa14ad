package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((7L, "hello world"), (8L, "")).toDF("doc_id", "text")

  test("asMediaTable produces the opaque-binary media schema") {
    val m = Multimodal.asMediaTable(docs, "doc_id", "text")
    assert(m.schema.fieldNames.toSeq == Multimodal.mediaSchema.fieldNames.toSeq)
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.count() == 2)
  }

  test("parseImageHeader reads real PNG IHDR dimensions and channel map") {
    // hand-built 640×480 RGBA PNG header (color type 6 → 4 channels)
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, // width 640
      0, 0, 0x01, 0xE0, // height 480
      8, 6, 0, 0, 0,    // bit depth 8, color type 6 (RGBA)
      0, 0, 0, 0).map(_.toByte)
    assert(Multimodal.parseImageHeader(png).contains((640, 480, 4)))
  }

  test("parseImageHeader walks JPEG segments to SOF0 past APP0") {
    // FFD8, APP0 (16 bytes of JFIF), SOF0: precision 8, 480×640, 3 comps
    val jpeg = (Array[Int](0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x10) ++ Array.fill(14)(0x4A) ++
      Array[Int](0xFF, 0xC0, 0x00, 0x11, 0x08,
        0x01, 0xE0, // height 480
        0x02, 0x80, // width 640
        0x03)).map(_.toByte)
    assert(Multimodal.parseImageHeader(jpeg).contains((640, 480, 3)))
  }

  test("parseImageHeader rejects non-image payloads") {
    assert(Multimodal.parseImageHeader("plain text payload".getBytes).isEmpty)
    assert(Multimodal.parseImageHeader(Array[Byte](0x89.toByte, 'P', 'N')).isEmpty)
  }

  test("synthesized PNG payloads round-trip through the real decoder") {
    import org.apache.spark.sql.functions._
    val src = Seq((3L, 17L), (4L, 99L)).toDF("doc_id", "n")
    val media = Multimodal.asPngMediaTable(src, "doc_id",
      lit(16) + pmod(col("doc_id"), lit(64L)),
      lit(16) + pmod(col("n"), lit(64L)))
    val out = Multimodal.decodeFeatures(media)
      .select("media_id", "width", "height", "channels", "n_bytes")
      .as[(Long, Int, Int, Int, Long)].collect().toSet
    assert(out == Set((3L, 19, 33, 3, 33L), (4L, 20, 51, 3, 33L)))
  }

  test("synthesized WAV payloads round-trip through the real RIFF walker") {
    import org.apache.spark.sql.functions._
    val src = Seq(Tuple1(0L), Tuple1(5L)).toDF("doc_id")
    val media = Multimodal.asWavMediaTable(src, "doc_id",
      lit(8000L) + pmod(col("doc_id"), lit(8L)) * 1000L,
      lit(1L) + pmod(col("doc_id"), lit(2L)))
    val out = Multimodal.decodeAudioMeta(media)
      .as[(Long, Int, Int, Int, Long)].collect().toSet
    assert(out == Set((0L, 8000, 1, 16, 44L), (5L, 13000, 2, 16, 44L)))
  }

  test("parseWavHeader walks preceding chunks and rejects malformed payloads") {
    // a LIST chunk (odd size → word-aligned walk) before fmt
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(44100) ++ le32(44100 * 4) ++ le16(4) ++ le16(16)
    val withList = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      ("LIST".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0)) ++ fmt
    assert(Multimodal.parseWavHeader(withList).contains((44100, 2, 16)))
    assert(Multimodal.parseWavHeader("RIFFxxxxNOPE".getBytes).isEmpty)
    assert(Multimodal.parseWavHeader(
      "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++ "fmt ".getBytes ++ le32(16) ++
        le16(99) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)).isEmpty,
      "non-PCM format codes must be rejected")
    // adversarial chunk size near Int.MaxValue: an Int cursor would wrap
    // negative (8 + size + pad), re-pass the bounds guard, and throw
    // ArrayIndexOutOfBounds — must return None, never throw
    val overflow = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      ("JUNK".getBytes ++ le32(Int.MaxValue - 4)) ++ fmt
    assert(Multimodal.parseWavHeader(overflow).isEmpty)
  }

  test("decodeFeatures emits deterministic metadata and drops the payload") {
    val m = Multimodal.asMediaTable(docs, "doc_id", "text")
    val d = Multimodal.decodeFeatures(m)
    assert(d.schema.fieldNames.toSeq ==
      Seq("media_id", "width", "height", "channels", "n_bytes", "features"))
    val byId = d.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(7L).getLong(4) == "hello world".getBytes.length.toLong)
    assert(byId(8L).getLong(4) == 0L)
    val first = byId.view.mapValues(_.getSeq[Float](5)).toMap
    val again = Multimodal.decodeFeatures(m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](5)).toMap
    assert(again == first)
  }

  // ---- full-pixel PNG codec + perceptual dedup (r13) ----

  test("gray PNG encode->decode round-trips pixels through real zlib and filters") {
    val w = 9; val h = 8
    val px = Array.tabulate(w * h)(i => (i * 37 + 11) % 256)
    val png = Multimodal.encodeGrayPng(w, h, px)
    // it is also a valid header for the existing metadata parser
    assert(Multimodal.parseImageHeader(png).contains((9, 8, 1)))
    val got = Multimodal.decodePngGray(png)
    assert(got.isDefined, "decode failed")
    val (gw, gh, gpx) = got.get
    assert((gw, gh) == (w, h))
    assert(gpx.toSeq == px.toSeq,
      "pixels must survive deflate->inflate->unfilter exactly")
  }

  test("decoder handles Sub/Average/Paeth filters and truecolor luma") {
    // hand-assemble PNGs exercising filter types the encoder never
    // emits, via the same chunk/CRC helpers
    def buildPng(w: Int, h: Int, colorType: Int,
                 rawScanlines: Array[Byte]): Array[Byte] = {
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(rawScanlines); deflater.finish()
      val zOut = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
      out.write(Multimodal.pngChunk("IHDR", ihdr))
      out.write(Multimodal.pngChunk("IDAT", zOut.toByteArray))
      out.write(Multimodal.pngChunk("IEND", Array.empty[Byte]))
      out.toByteArray
    }
    // gray 3x3, rows filtered Sub(1) / Average(3) / Paeth(4) — filtered
    // bytes computed by hand from the spec's reconstruction rules
    val want = Array(10, 20, 30, 40, 50, 60, 70, 80, 90)
    def flt(y: Int, x: Int, f: Int): Int = {
      val v = want(y * 3 + x)
      val a = if (x > 0) want(y * 3 + x - 1) else 0
      val b = if (y > 0) want((y - 1) * 3 + x) else 0
      val c = if (x > 0 && y > 0) want((y - 1) * 3 + x - 1) else 0
      f match {
        case 1 => (v - a) & 0xFF
        case 3 => (v - (a + b) / 2) & 0xFF
        case 4 =>
          val p = a + b - c
          val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
          val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          (v - pred) & 0xFF
      }
    }
    val raw = new java.io.ByteArrayOutputStream()
    Seq(1, 3, 4).zipWithIndex.foreach { case (f, y) =>
      raw.write(f); (0 until 3).foreach(x => raw.write(flt(y, x, f)))
    }
    val gray = Multimodal.decodePngGray(buildPng(3, 3, 0, raw.toByteArray))
    assert(gray.isDefined && gray.get._3.toSeq == want.toSeq,
      s"unfilter mismatch: ${gray.map(_._3.toSeq)}")
    // truecolor 2x1, filter None: luma = (299r+587g+114b)/1000
    val rgbRaw = Array[Byte](0, 255.toByte, 0, 0, 0, 0, 255.toByte)
    val rgb = Multimodal.decodePngGray(buildPng(2, 1, 2, rgbRaw))
    assert(rgb.isDefined && rgb.get._3.toSeq == Seq(255 * 299 / 1000, 255 * 114 / 1000))
    // corrupt payloads: never throw
    assert(Multimodal.decodePngGray(null).isEmpty)
    assert(Multimodal.decodePngGray("not a png at all".getBytes).isEmpty)
    val truncated = Multimodal.encodeGrayPng(9, 8, Array.fill(72)(5)).take(40)
    assert(Multimodal.decodePngGray(truncated).isEmpty)
  }

  test("dhash64 compares adjacent grid cells; one-pixel edits stay within small hamming") {
    val base = Array.tabulate(72)(i => (i * 53 + 7) % 241)
    val h0 = Multimodal.dhash64(9, 8, base)
    // flipping one pixel changes at most the two comparisons touching it
    val edited = base.clone(); edited(40) = (edited(40) + 128) % 241
    val h1 = Multimodal.dhash64(9, 8, edited)
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 2)
    // a 18x16 image box-samples down to the same hash as its 9x8 source
    val big = Array.tabulate(18 * 16) { i =>
      val x = i % 18; val y = i / 18
      base((y / 2) * 9 + (x / 2))
    }
    assert(Multimodal.dhash64(18, 16, big) == h0,
      "2x upscale must box-sample to the identical dhash")
  }

  test("imageNearDupPairs finds engineered near-dups through the full codec path") {
    // 3 images: 101/102 near-dups (one-pixel edit), 103 unrelated
    val mk: Long => Array[Int] = seed =>
      Array.tabulate(72) { i =>
        val g = (seed * 2654435761L + i * 97L) ^ ((seed * 2654435761L + i * 97L) >> 7)
        ((g * 31) % 241).toInt.abs
      }
    val a = mk(1L)
    val b = a.clone(); b(30) = (b(30) + 120) % 241
    val c = mk(9L)
    val pixelRows = Seq((101L, a.toSeq), (102L, b.toSeq), (103L, c.toSeq))
      .toDF("doc_id", "px")
    val media = Multimodal.asGrayPngMediaTable(
      pixelRows, "doc_id", 9, 8, org.apache.spark.sql.functions.col("px"))
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((101L, 102L)),
      s"engineered near-dup must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 103L || p._2 == 103L),
      s"unrelated image must not pair: $pairs")
    // undecodable payloads are excluded, not fatal
    val broken = media.unionByName(Multimodal.asMediaTable(
      Seq((999L, "garbage")).toDF("doc_id", "text"), "doc_id", "text"))
    val withBroken = Multimodal.imageNearDupPairs(broken, maxHamming = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(withBroken == pairs)
  }

  test("synthesized MP4 payloads round-trip through the real box walker") {
    val rows = Seq((1L, 600, 30000L, 640, 480), (2L, 1000, 99999L, 320, 240))
      .toDF("doc_id", "ts", "dur", "w", "h")
    val media = Multimodal.asMp4MediaTable(rows, "doc_id",
      $"ts", $"dur", $"w", $"h")
    val got = Multimodal.decodeVideoMeta(media)
      .as[(Long, Int, Long, Int, Int, Long)].collect().toSet
    assert(got == Set(
      (1L, 600, 30000L * 1000 / 600, 640, 480, 232L),
      (2L, 1000, 99999L * 1000 / 1000, 320, 240, 232L)), got.toString)
  }

  test("parseMp4Header walks boxes, rejects malformed and version-1 payloads") {
    // a valid payload parses; version-0 offsets verified by round-trip above
    val ok = Multimodal.asMp4MediaTable(
        Seq((1L, 600, 1200L, 64, 48)).toDF("doc_id", "ts", "dur", "w", "h"),
        "doc_id", $"ts", $"dur", $"w", $"h")
      .select("payload").as[Array[Byte]].head()
    assert(Multimodal.parseMp4Header(ok).contains((600, 1200L, 64, 48)))
    // truncated mid-box
    assert(Multimodal.parseMp4Header(ok.take(40)).isEmpty)
    // garbage and non-MP4
    assert(Multimodal.parseMp4Header("not an mp4 file at all!!".getBytes).isEmpty)
    assert(Multimodal.parseMp4Header(null).isEmpty)
    // an adversarial box size near 2^32 must not wrap the bounds walk
    val evil = ok.clone()
    evil(16) = 0xFF.toByte; evil(17) = 0xFF.toByte // moov size -> huge
    assert(Multimodal.parseMp4Header(evil).isEmpty)
    // version-1 (64-bit) mvhd: refused, not mis-read at wrong offsets
    val v1 = ok.clone()
    v1(16 + 8 + 8) = 1 // mvhd version byte (ftyp 16 + moov hdr 8 + mvhd hdr 8)
    assert(Multimodal.parseMp4Header(v1).isEmpty)
  }

  test("videoFrameDHash samples frames by seek and matches the image dhash kernel") {
    // 3 frames of known pixels; frame 1 equals a standalone 9x8 image,
    // so its dhash must equal the image path's on the same pixels
    val frame = (s: Long) => Array.tabulate(72) { i =>
      ((s * 2654435761L + i * 97L) % 241).toInt.abs
    }
    val f0 = frame(1); val f1 = frame(2); val f2 = frame(3)
    val px = (f0 ++ f1 ++ f2).toSeq
    val media = Multimodal.asMp4FramesMediaTable(
      Seq((7L, px)).toDF("doc_id", "px"), "doc_id",
      timescale = 600, w = 9, h = 8, nFrames = 3, $"px")
    val all = Multimodal.videoFrameDHash(media, everyN = 1)
      .as[(Long, Int, Long)].collect().toSet
    assert(all.map(_._2) == Set(0, 1, 2))
    assert(all.find(_._2 == 1).get._3 == Multimodal.dhash64(9, 8, f1),
      "frame dhash must equal the image kernel on the same pixels")
    // sampling keeps exactly every 2nd frame
    val sampled = Multimodal.videoFrameDHash(media, everyN = 2)
      .as[(Long, Int, Long)].collect().toSet
    assert(sampled.map(_._2) == Set(0, 2), sampled.toString)
    assert(sampled == all.filter(r => r._2 % 2 == 0))
    // metadata of the frame container parses too (duration = nFrames ticks)
    val meta = Multimodal.decodeVideoMeta(media)
      .as[(Long, Int, Long, Int, Int, Long)].head()
    assert(meta._2 == 600 && meta._3 == 3L * 1000 / 600 &&
      meta._4 == 9 && meta._5 == 8, meta.toString)
    // corrupt payloads contribute no rows, never throw
    val broken = media.unionByName(Multimodal.asMediaTable(
      Seq((999L, "garbage")).toDF("doc_id", "text"), "doc_id", "text"))
    assert(Multimodal.videoFrameDHash(broken, 1)
      .as[(Long, Int, Long)].collect().toSet == all)
  }

  test("videoFingerprints: frame-sum dhash, small-edit locality, sniff routing") {
    val frame = (s: Long) => Array.tabulate(72) { i =>
      ((s * 2654435761L + i * 97L) % 241).toInt.abs
    }
    val f0 = frame(1); val f1 = frame(2); val f2 = frame(3)
    def mk(id: Long, fs: Array[Int]*) = Multimodal.asMp4FramesMediaTable(
      Seq((id, fs.flatten.toSeq)).toDF("doc_id", "px"), "doc_id",
      timescale = 600, w = 9, h = 8, nFrames = fs.length, $"px")
    val media = mk(7L, f0, f1, f2)
    val got = Multimodal.videoFingerprints(media)
      .as[(Long, Option[Long])].head()
    // the fingerprint IS the dhash of the per-position frame sum
    val sums = Array.tabulate(72)(i =>
      f0(i).toLong + f1(i).toLong + f2(i).toLong)
    assert(got == (7L -> Some(Multimodal.dhash64L(9, 8, sums))))
    // one perturbed pixel in one frame flips <= 2 bits (the near-dup
    // locality the Hamming pairing consumes)
    val f1e = f1.clone(); f1e(40) = (f1e(40) + 128) % 241
    val gotE = Multimodal.videoFingerprints(mk(8L, f0, f1e, f2))
      .as[(Long, Option[Long])].head()
    assert(java.lang.Long.bitCount(got._2.get ^ gotE._2.get) <= 2)
    // everyN sampling folds only the sampled frames
    val sampled = Multimodal.videoFingerprints(media, everyN = 2)
      .as[(Long, Option[Long])].head()
    val sums02 = Array.tabulate(72)(i => f0(i).toLong + f2(i).toLong)
    assert(sampled._2.contains(Multimodal.dhash64L(9, 8, sums02)))
    // undecodable payloads fingerprint to null, never throw
    val broken = Multimodal.asMediaTable(
      Seq((999L, "garbage")).toDF("doc_id", "text"), "doc_id", "text")
    assert(Multimodal.videoFingerprints(broken)
      .as[(Long, Option[Long])].head()._2.isEmpty)
    // mediaFingerprints sniff-routes the MP4 as kind "video" (r20 —
    // the curation loop's video leg) and drops the undecodable row
    val routed = Multimodal.mediaFingerprints(media.unionByName(broken))
      .as[(Long, String, Long)].collect().toSet
    assert(routed == Set((7L, "video", got._2.get)))
  }

  test("PCM WAV encode->decode round-trips signed samples; out-of-range clamps") {
    val pcm = Array(0, 1, -1, 32767, -32768, 15000, -15000, 123, -9999)
    val decoded = Multimodal.decodeWavPcm(Multimodal.encodePcmWav(16000, pcm))
    assert(decoded.exists(_.sameElements(pcm)), s"round-trip: ${decoded.map(_.toSeq)}")
    // encode clamps to the signed 16-bit range instead of wrapping
    val clamped = Multimodal.decodeWavPcm(
      Multimodal.encodePcmWav(16000, Array(40000, -40000))).get
    assert(clamped.toSeq == Seq(32767, -32768))
    // malformed payloads decode to None, never throw
    assert(Multimodal.decodeWavPcm(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeWavPcm("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // a storage-truncated data chunk still yields the present samples
    val full = Multimodal.encodePcmWav(16000, Array(5, 6, 7, 8))
    val truncated = Multimodal.decodeWavPcm(full.dropRight(4)).get
    assert(truncated.toSeq == Seq(5, 6))
  }

  test("audioFingerprint64: one-sample edits flip at most 2 bits; gain-invariant") {
    val base = Array.tabulate(520) { i =>
      val g = (7L * 2654435761L + i * 7349L) ^ ((7L * 2654435761L + i * 7349L) >> 7)
      ((g * 31) % 30000).toInt.abs - 15000
    }
    val f0 = Multimodal.audioFingerprint64(base)
    // one changed sample moves one frame's energy -> <= 2 adjacent-
    // frame comparisons change
    val edited = base.clone(); edited(200) = edited(200) + 9000
    assert(java.lang.Long.bitCount(f0 ^ Multimodal.audioFingerprint64(edited)) <= 2)
    // uniform gain preserves every energy comparison exactly
    val louder = base.map(_ * 2)
    assert(Multimodal.audioFingerprint64(louder) == f0,
      "uniform gain must not change the fingerprint")
  }

  test("audioNearDupPairs finds engineered near-dups through the full codec path") {
    val mk: Long => Array[Int] = seed =>
      Array.tabulate(520) { i =>
        val g = (seed * 2654435761L + i * 7349L) ^ ((seed * 2654435761L + i * 7349L) >> 7)
        ((g * 31) % 30000).toInt.abs - 15000
      }
    val a = mk(1L)
    val b = a.clone(); b(100) = b(100) + 9000 // one-sample edit
    val c = mk(9L)                            // unrelated signal
    val rows = Seq((201L, a.toSeq), (202L, b.toSeq), (203L, c.toSeq))
      .toDF("doc_id", "pcm")
    val media = Multimodal.asPcmWavMediaTable(rows, "doc_id", 16000,
      org.apache.spark.sql.functions.col("pcm"))
    val pairs = Multimodal.audioNearDupPairs(media, maxHamming = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((201L, 202L)), s"engineered near-dup must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 203L || p._2 == 203L),
      s"unrelated audio must not pair: $pairs")
    // undecodable payloads are excluded, not fatal
    val broken = media.unionByName(Multimodal.asMediaTable(
      Seq((999L, "garbage")).toDF("doc_id", "text"), "doc_id", "text"))
    val withBroken = Multimodal.audioNearDupPairs(broken, maxHamming = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(withBroken == pairs)
  }
}
