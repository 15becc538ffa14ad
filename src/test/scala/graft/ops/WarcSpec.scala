package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

import java.nio.charset.StandardCharsets.UTF_8

/** [[Warc]] edge cases the round-trip oracle (q155) cannot reach:
  * payloads CONTAINING the record magic (the reason the parser is
  * Content-Length-driven), multi-byte octet accounting, and the
  * never-throws lenient-stop contract on truncation/corruption.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def fileDf(blobs: (Long, Array[Byte])*) = {
    val schema = StructType(Seq(
      StructField("file_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(blobs.map { case (i, b) => Row(i, b) }),
      schema)
  }

  private def rec(id: String, uri: String, body: String): String = {
    val n = body.getBytes(UTF_8).length
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: $id\r\n" +
      s"WARC-Target-URI: $uri\r\nContent-Type: text/plain\r\n" +
      s"Content-Length: $n\r\n\r\n$body\r\n\r\n"
  }

  test("payload containing 'WARC/1.0' does not split the record") {
    val body = "fake header follows\r\nWARC/1.0\r\nWARC-Type: trap\r\n\r\nstill me"
    val blob = (rec("<a>", "u1", body) + rec("<b>", "u2", "tail")).getBytes(UTF_8)
    val out = Warc.parseRecords(fileDf(0L -> blob))
      .orderBy("rec_index")
      .select("record_id", "payload_text").as[(String, String)].collect()
    assert(out === Array(("<a>", body), ("<b>", "tail")))
  }

  test("octet accounting: CJK/emoji payload round-trips exactly") {
    val body = "中文 😀 — done"
    val blob = rec("<m>", "u", body).getBytes(UTF_8)
    val out = Warc.parseRecords(fileDf(1L -> blob))
      .select("content_length", "payload_text").as[(Long, String)].head()
    assert(out === ((body.getBytes(UTF_8).length.toLong, body)))
  }

  test("truncated final record: parsed prefix kept, walk stops") {
    val good = rec("<a>", "u1", "alpha")
    val cut = rec("<b>", "u2", "beta-truncated").dropRight(9)
    val out = Warc.parseRecords(fileDf(2L -> (good + cut).getBytes(UTF_8)))
      .select("record_id").as[String].collect()
    assert(out === Array("<a>"))
  }

  test("lying Content-Length loses alignment: later records dropped, no throw") {
    val lying = rec("<a>", "u1", "alpha").replace("Content-Length: 5", "Content-Length: 7")
    val out = Warc.parseRecords(
      fileDf(3L -> (lying + rec("<b>", "u2", "beta")).getBytes(UTF_8)))
    // record <a> itself parses (7 bytes sliced) but the terminator
    // check fails — nothing is emitted after alignment is lost
    assert(out.count() === 0L)
  }

  test("empty blob and null payload emit nothing") {
    val out = Warc.parseRecords(fileDf(4L -> Array.empty[Byte], 5L -> null))
    assert(out.count() === 0L)
  }

  test("synth side: asWarcFiles orders members by the order column") {
    val df = Seq((0L, 2L, "B"), (0L, 1L, "A")).toDF("f", "o", "t")
    val files = Warc.asWarcFiles(df, col("f"), col("o"),
      Warc.recordString(lit("<r>"), lit("u"), col("t")))
    val recs = Warc.parseRecords(files).orderBy("rec_index")
      .select("payload_text").as[String].collect()
    assert(recs === Array("A", "B"))
  }
}
