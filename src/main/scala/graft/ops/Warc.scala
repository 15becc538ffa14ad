package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets.UTF_8

/** WARC record synthesis + parsing — the container format crawl
  * corpora actually arrive in (Common Crawl ships WARC/WET/WAT; every
  * web-scale training pipeline starts by walking these). The shape
  * mirrors the [[Multimodal]] media doctrine: payloads are synthesized
  * in-query from row data so an external engine can replay
  * synthesis→parse arithmetically, and the PARSER is real — a
  * byte-accurate `Content-Length`-driven record walk over the
  * concatenated-file blob, exactly what a standards-correct WARC
  * reader does (records are NOT separator-split: payloads may contain
  * anything, including "WARC/1.0").
  *
  * Scale shape: one row per WARC FILE (the real unit — Common Crawl
  * segments via `spark.read.format("binaryFile")` land one blob per
  * row the same way), parse is `mapPartitions` partition-local
  * (justified: stateful byte walk, no Catalyst fit — the [[Multimodal]]
  * precedent), and only the parsed FIELDS ever reach an exchange; the
  * blob dies with the scan stage. Gzip member decompression (real
  * .warc.gz is per-record gzip members) would slot between slice and
  * decode using [[Multimodal]]'s Inflater discipline — omitted here
  * because the synth side would then be untestable SQL-side.
  *
  * Never-throws contract (the corpus-scan rule every decoder here
  * follows): a malformed header, a non-numeric/absent Content-Length,
  * or a record truncated mid-payload ends THAT file's walk — records
  * already parsed are kept, the rest of the blob is unparseable by
  * construction (the walk has lost byte alignment), and a poisoned
  * file must not kill a 100 TB scan.
  */
object Warc {

  /** One WARC/1.0 response record as a string column: version line,
    * the four headers every consumer keys on, `Content-Length` in
    * OCTETS of the UTF-8 payload (the spec's unit — `octet_length`,
    * not `length`: a CJK/emoji payload differs), blank line, payload,
    * record terminator.
    */
  def recordString(recordId: Column, targetUri: Column, payload: Column): Column =
    concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: "), recordId,
      lit("\r\nWARC-Target-URI: "), targetUri,
      lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
      octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n\r\n"))

  /** Concatenate records into per-file blobs: group by `fileId`,
    * order members by `orderCol` INSIDE the aggregate
    * (`array_sort(collect_list(struct))` — collect_list order is not
    * deterministic across partitionings, the sort is load-bearing),
    * join, UTF-8 encode. One shuffle, record-string payload — at crawl
    * scale this is the WRITE side (building archival files); the read
    * side below never shuffles blobs.
    */
  def asWarcFiles(df: DataFrame, fileId: Column, orderCol: Column,
                  record: Column): DataFrame =
    df.select(fileId.cast("long").as("file_id"),
        struct(orderCol.as("o"), record.as("r")).as("s"))
      .groupBy(col("file_id"))
      .agg(encode(
        array_join(transform(array_sort(collect_list(col("s"))),
          x => x.getField("r")), ""), "UTF-8").as("payload"))

  private val recSchema = StructType(Seq(
    StructField("file_id", LongType, nullable = false),
    StructField("rec_index", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("payload_text", StringType, nullable = false)))

  /** Walk a file blob: per record, read the version line, accumulate
    * headers to the blank line, slice exactly `Content-Length` payload
    * bytes, verify the `\r\n\r\n` terminator, emit. `rec_index` is the
    * record's position in the file — byte order, which the oracle
    * replays as the member sort order.
    */
  def parseRecords(files: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(recSchema)
    files.select(col("file_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val fid = r.getLong(0)
          val p = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          var i = 0
          var idx = 0L
          var ok = true
          // ASCII line up to \r\n, or null on truncation/overlong
          def line(): String = {
            var j = i
            while (j + 1 < p.length && !(p(j) == '\r' && p(j + 1) == '\n')) j += 1
            if (j + 1 >= p.length) { ok = false; null }
            else { val s = new String(p, i, j - i, UTF_8); i = j + 2; s }
          }
          while (ok && i < p.length) {
            val version = line()
            if (!ok || version != "WARC/1.0") ok = false
            else {
              var typ = ""; var rid = ""; var uri = ""; var clen = -1L
              var h = line()
              while (ok && h != null && h.nonEmpty) {
                val cut = h.indexOf(": ")
                if (cut < 0) ok = false
                else h.substring(0, cut) match {
                  case "WARC-Type" => typ = h.substring(cut + 2)
                  case "WARC-Record-ID" => rid = h.substring(cut + 2)
                  case "WARC-Target-URI" => uri = h.substring(cut + 2)
                  case "Content-Length" =>
                    clen = try h.substring(cut + 2).toLong
                    catch { case _: NumberFormatException => ok = false; -1L }
                  case _ => ()
                }
                if (ok) h = line()
              }
              if (ok && (clen < 0 || i + clen + 4 > p.length)) ok = false
              if (ok) {
                val body = new String(p, i, clen.toInt, UTF_8)
                i += clen.toInt
                if (p(i) == '\r' && p(i + 1) == '\n' &&
                    p(i + 2) == '\r' && p(i + 3) == '\n') {
                  i += 4
                  out += Row(fid, idx, typ, rid, uri, clen, body)
                  idx += 1
                } else ok = false
              }
            }
          }
          out.iterator
        }
      }(enc)
  }
}
