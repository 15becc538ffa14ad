package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-type sniffing from magic bytes — multimodal ingest must
  * dispatch payloads by what the BYTES are, never by a crawl-supplied
  * extension or Content-Type header (both routinely lie in the wild;
  * the [[Multimodal]] decoders each assume their own container, so a
  * mislabeled payload reaching the wrong kernel is wasted decode work
  * at best). One codegen'd `when` chain over fixed-offset hex slices —
  * a narrow per-row map, bytes never shuffle, no UDF.
  *
  * Signatures (all public magic numbers): PNG, JPEG, GIF, PDF, gzip,
  * ZIP, RIFF/WAVE, ISO-BMFF `ftyp` (MP4 family), WARC/1.0 — the types
  * this engine's decode/parse kernels consume — with
  * `application/octet-stream` as the honest fallback (a text/binary
  * heuristic over arbitrary bytes is locale bait; callers wanting
  * text-ness use [[Quality]] signals on a DECODED column instead).
  */
object Mime {

  private def hexAt(bin: Column, pos: Int, len: Int): Column =
    hex(substring(bin, pos, len))

  /** Sniffed MIME for a binary column; never null. */
  def sniffMime(bin: Column): Column =
    when(bin.isNull, lit("application/octet-stream"))
      .when(hexAt(bin, 1, 8) === "89504E470D0A1A0A", lit("image/png"))
      .when(hexAt(bin, 1, 3) === "FFD8FF", lit("image/jpeg"))
      .when(hexAt(bin, 1, 4) === "47494638", lit("image/gif"))
      .when(hexAt(bin, 1, 4) === "25504446", lit("application/pdf"))
      .when(hexAt(bin, 1, 2) === "1F8B", lit("application/gzip"))
      .when(hexAt(bin, 1, 4) === "504B0304", lit("application/zip"))
      .when(hexAt(bin, 1, 4) === "52494646" &&
        hexAt(bin, 9, 4) === "57415645", lit("audio/wav"))
      .when(hexAt(bin, 5, 4) === "66747970", lit("video/mp4"))
      // "WARC/1.0" — crawl containers carry their own magic
      .when(hexAt(bin, 1, 8) === "574152432F312E30",
        lit("application/warc"))
      .otherwise(lit("application/octet-stream"))

  /** Byte-level twin of [[sniffMime]] for single-pass JVM kernels
    * (r20 — [[Multimodal.mediaFingerprints]] dispatches sniff+decode
    * in ONE partition-local map instead of one filtered scan per
    * modality): same signatures, same precedence, same fallback.
    * Agreement with the Column chain is spec-pinned (`MimeSpec`).
    */
  def sniffMimeBytes(p: Array[Byte]): String = {
    def at(i: Int, magic: Int*): Boolean =
      p.length >= i + magic.length && {
        var k = 0
        while (k < magic.length && (p(i + k) & 0xFF) == magic(k)) k += 1
        k == magic.length
      }
    if (p == null) "application/octet-stream"
    else if (at(0, 0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)) "image/png"
    else if (at(0, 0xFF, 0xD8, 0xFF)) "image/jpeg"
    else if (at(0, 0x47, 0x49, 0x46, 0x38)) "image/gif"
    else if (at(0, 0x25, 0x50, 0x44, 0x46)) "application/pdf"
    else if (at(0, 0x1F, 0x8B)) "application/gzip"
    else if (at(0, 0x50, 0x4B, 0x03, 0x04)) "application/zip"
    else if (at(0, 0x52, 0x49, 0x46, 0x46) &&
      at(8, 0x57, 0x41, 0x56, 0x45)) "audio/wav"
    else if (at(4, 0x66, 0x74, 0x79, 0x70)) "video/mp4"
    else if (at(0, 0x57, 0x41, 0x52, 0x43, 0x2F, 0x31, 0x2E, 0x30))
      "application/warc"
    else "application/octet-stream"
  }
}
