package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Magic-byte sniffing through [[Mime.sniffMime]]: every supported
  * signature, offset-sensitive cases (WAVE at 9, ftyp at 5), truncated
  * and null payloads, and the fallback.
  */
class MimeSpec extends SparkSpec {
  import spark.implicits._

  private def sniffHex(h: String): String =
    Seq(h).toDF("h").select(Mime.sniffMime(unhex(col("h")))).as[String].head()

  test("every signature resolves, including the offset-sensitive ones") {
    assert(sniffHex("89504E470D0A1A0A0000000D") === "image/png")
    assert(sniffHex("FFD8FFE000104A46") === "image/jpeg")
    assert(sniffHex("474946383961") === "image/gif")
    assert(sniffHex("255044462D312E34") === "application/pdf")
    assert(sniffHex("1F8B0800") === "application/gzip")
    assert(sniffHex("504B030414000000") === "application/zip")
    // RIFF....WAVE — the WAVE tag sits at byte 9
    assert(sniffHex("524946461000000057415645") === "audio/wav")
    // RIFF....AVI  is NOT wav
    assert(sniffHex("524946461000000041564920") === "application/octet-stream")
    // size + 'ftyp' at byte 5
    assert(sniffHex("000000106674797069736F6D") === "video/mp4")
    assert(sniffHex("574152432F312E300D0A") === "application/warc")
  }

  test("real synthesized containers sniff to their types") {
    val row = Seq(1).toDF("i").select(
      Mime.sniffMime(Multimodal.syntheticPng(lit(4), lit(4))).as("p"),
      Mime.sniffMime(Multimodal.syntheticMp4(
        lit(1000L), lit(2000L), lit(8L), lit(8L))).as("m"),
      Mime.sniffMime(encode(Warc.recordString(
        lit("<urn:uuid:1>"), lit("https://x/"), lit("hi")), "UTF-8")).as("w")
    ).as[(String, String, String)].head()
    assert(row === (("image/png", "video/mp4", "application/warc")))
  }

  test("sniffMimeBytes agrees with the Column chain on every case above") {
    // the byte-level twin (r20 — the single-pass mediaFingerprints
    // dispatch) must route every payload exactly as the Column chain
    // does: same signatures, same precedence, same fallback
    val hexes = Seq(
      "89504E470D0A1A0A0000000D", "FFD8FFE000104A46", "474946383961",
      "255044462D312E34", "1F8B0800", "504B030414000000",
      "524946461000000057415645", "524946461000000041564920",
      "000000106674797069736F6D", "574152432F312E300D0A",
      "8950", "", "54206865780D")
    for (h <- hexes) {
      val bytes = h.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray
      assert(Mime.sniffMimeBytes(bytes) === sniffHex(h), s"hex=$h")
    }
    assert(Mime.sniffMimeBytes(null) === "application/octet-stream")
  }

  test("truncated, empty, and null payloads fall back — never throw") {
    // 2-byte prefix of a PNG: the 8-byte slice comes back short, no match
    assert(sniffHex("8950") === "application/octet-stream")
    assert(sniffHex("") === "application/octet-stream")
    val n = Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(Mime.sniffMime(col("b"))).as[String].head()
    assert(n === "application/octet-stream")
  }
}
