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

  // ————— gzip members (.warc.gz, r16) —————

  test("gz round-trip: parseGzRecords over asWarcGzFiles equals the plain parse") {
    val df = Seq((0L, 1L, "alpha"), (0L, 2L, "beta — 中文 😀"), (1L, 1L, "solo"))
      .toDF("f", "o", "t")
    def recCol = Warc.recordString(lit("<r>"), lit("u"), col("t"))
    val plain = Warc.parseRecords(Warc.asWarcFiles(df, col("f"), col("o"), recCol))
      .orderBy("file_id", "rec_index").collect().toSeq
    val gz = Warc.parseGzRecords(Warc.asWarcGzFiles(df, col("f"), col("o"), recCol))
      .orderBy("file_id", "rec_index").collect().toSeq
    assert(gz === plain, "the container must be invisible to every parsed field")
  }

  test("gz member walk: offsets and comp_len support random access re-slice") {
    val df = Seq((0L, 1L, "one"), (0L, 2L, "two"), (0L, 3L, "three"))
      .toDF("f", "o", "t")
    val files = Warc.asWarcGzFiles(df, col("f"), col("o"),
      Warc.recordString(lit("<r>"), lit("u"), col("t")))
    val blob = files.select("payload").as[Array[Byte]].head()
    val members = Warc.splitGzMembers(files)
      .orderBy("member_index")
      .select("byte_offset", "comp_len", "member_bytes")
      .as[(Long, Long, Array[Byte])].collect()
    assert(members.length === 3)
    // contiguity: members tile the blob exactly
    assert(members.head._1 === 0L)
    assert(members.map(m => m._1 + m._2).dropRight(1).sameElements(
      members.map(_._1).drop(1)))
    assert(members.last._1 + members.last._2 === blob.length.toLong)
    // the fetch-index contract: re-slicing the blob at (offset, len)
    // and inflating that slice alone reproduces the member bytes
    members.foreach { case (off, len, bytes) =>
      val slice = java.util.Arrays.copyOfRange(blob, off.toInt, (off + len).toInt)
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(slice))
      val got = try in.readAllBytes() finally in.close()
      assert(got.sameElements(bytes))
    }
  }

  test("gz corrupt middle member: prior members kept, walk stops, no throw") {
    val df = Seq((0L, 1L, "first"), (0L, 2L, "second"), (0L, 3L, "third"))
      .toDF("f", "o", "t")
    val files = Warc.asWarcGzFiles(df, col("f"), col("o"),
      Warc.recordString(lit("<r>"), lit("u"), col("t")))
    val blob = files.select("payload").as[Array[Byte]].head()
    val offsets = Warc.splitGzMembers(files).orderBy("member_index")
      .select("byte_offset").as[Long].collect()
    // flip a byte inside the SECOND member's deflate stream
    val bad = blob.clone()
    val mid = offsets(1).toInt + 12
    bad(mid) = (bad(mid) ^ 0x5A).toByte
    val recs = Warc.parseGzRecords(fileDf(0L -> bad))
      .orderBy("rec_index").select("payload_text").as[String].collect()
    assert(recs === Array("first"),
      "corruption must fail closed at the bad member, keeping the prefix")
  }

  test("gz indexed fetch: selected members equal the full parse's restriction") {
    val df = Seq((0L, 1L, "m0"), (0L, 2L, "m1"), (0L, 3L, "m2"), (0L, 4L, "m3"),
      (1L, 1L, "n0"), (1L, 2L, "n1"))
      .toDF("f", "o", "t")
    def recCol = Warc.recordString(lit("<r>"), lit("u"), col("t"))
    val files = Warc.asWarcGzFiles(df, col("f"), col("o"), recCol)
      .localCheckpoint(true)
    val index = Warc.splitGzMembers(files)
      .filter(col("member_index") % 2 === 0)
      .select("file_id", "member_index", "byte_offset", "comp_len")
    val fetched = Warc.fetchGzRecords(files, index)
      .orderBy("file_id", "member_index")
      .select("file_id", "member_index", "rec_index", "payload_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    // every 2nd member of each file; rec_index is within-member (0)
    assert(fetched === Seq((0L, 0L, 0L, "m0"), (0L, 2L, 0L, "m2"),
      (1L, 0L, 0L, "n0")))
  }

  test("gz member with FNAME and FEXTRA header fields parses (foreign writers)") {
    // hand-build a member with FLG = FEXTRA|FNAME around a deflate of
    // one record — java's writer never emits these, real ones do
    val body = rec("<x>", "u", "payload")
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(body.getBytes(UTF_8)); deflater.finish()
    val dOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) dOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val crc = new java.util.zip.CRC32(); crc.update(body.getBytes(UTF_8))
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8).toByte, 0, 0, 0, 0, 0, 0))
    bos.write(Array[Byte](3, 0)); bos.write(Array[Byte](1, 2, 3)) // FEXTRA len=3
    bos.write("name.warc".getBytes(UTF_8)); bos.write(0) // FNAME
    bos.write(dOut.toByteArray)
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    bos.write(le32(crc.getValue))
    bos.write(le32(body.getBytes(UTF_8).length.toLong))
    val recs = Warc.parseGzRecords(fileDf(0L -> bos.toByteArray))
      .select("payload_text").as[String].collect()
    assert(recs === Array("payload"))
  }
}
