package graft.ops

import org.scalacheck.{Gen, Prop, Properties}

/** Property/fuzz coverage for the dependency-free binary header
  * parsers — the code that faces arbitrary payload bytes at scale and
  * must never throw. Pure JVM (no Spark session): sbt runs ScalaCheck
  * `Properties` suites natively.
  */
object MultimodalProps extends Properties("Multimodal.parsers") {

  private def be32(v: Int) =
    Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le32(v: Int) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)

  private def pngBytes(w: Int, h: Int, colorType: Byte): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 0x0D, 'I', 'H', 'D', 'R') ++
      be32(w) ++ be32(h) ++
      Array[Byte](8, colorType, 0, 0, 0) ++ Array.fill[Byte](4)(0)

  private def wavBytes(sr: Int, ch: Int, bits: Int): Array[Byte] =
    "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(sr) ++
      le32(sr * ch * (bits / 8)) ++ le16(ch * (bits / 8)) ++ le16(bits) ++
      "data".getBytes ++ le32(0)

  property("png round-trip: width/height parse back exactly") =
    Prop.forAll(Gen.chooseNum(1, Int.MaxValue), Gen.chooseNum(1, Int.MaxValue),
        Gen.oneOf(0, 2, 3, 4, 6)) { (w, h, ct) =>
      val channels = Map(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)(ct)
      Multimodal.parseImageHeader(pngBytes(w, h, ct.toByte))
        .contains((w, h, channels))
    }

  property("wav round-trip: rate/channels/bits parse back exactly") =
    Prop.forAll(Gen.chooseNum(1, 384000), Gen.chooseNum(1, 8),
        Gen.oneOf(8, 16, 24, 32)) { (sr, ch, bits) =>
      Multimodal.parseWavHeader(wavBytes(sr, ch, bits))
        .contains((sr, ch, bits))
    }

  property("arbitrary bytes never throw from either parser") =
    Prop.forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      Multimodal.parseImageHeader(bytes)
      Multimodal.parseWavHeader(bytes)
      true
    }

  property("truncations of valid headers never throw and never mis-parse") =
    Prop.forAll(Gen.chooseNum(1, 4096), Gen.chooseNum(1, 4096),
        Gen.chooseNum(0, 43)) { (w, h, cut) =>
      val png = pngBytes(w, h, 2).take(cut)
      val wav = wavBytes(44100, 2, 16).take(cut)
      // a truncated header may parse only if the cut kept every field
      // the parser reads (PNG reads through offset 25; WAV through the
      // fmt chunk at offset 35) — it must never parse to WRONG values
      (Multimodal.parseImageHeader(png) match {
        case Some(parsed) => cut >= 26 && parsed == ((w, h, 3))
        case None => true
      }) && (Multimodal.parseWavHeader(wav) match {
        case Some(parsed) => cut >= 36 && parsed == ((44100, 2, 16))
        case None => true
      })
    }

  property("corrupting any single header byte never throws") =
    Prop.forAll(Gen.chooseNum(0, 43), Gen.choose(Byte.MinValue, Byte.MaxValue)) {
      (pos, b) =>
        val wav = wavBytes(22050, 1, 16); wav(pos) = b
        val png = pngBytes(100, 200, 2); png(pos % png.length) = b
        Multimodal.parseWavHeader(wav)
        Multimodal.parseImageHeader(png)
        true
    }
}
