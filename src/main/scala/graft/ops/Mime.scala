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
}
