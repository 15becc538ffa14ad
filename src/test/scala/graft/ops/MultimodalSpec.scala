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
}
