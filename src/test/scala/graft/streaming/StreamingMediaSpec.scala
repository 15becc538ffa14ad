package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Dedup, Multimodal}

/** Streaming multimodal curation (the q194 ingest path): the standing
  * label table maintained by the composed
  * StreamingMedia → StreamingCc.incrementalCcMergeSink loop after N
  * micro-batches must equal ONE q194-shaped batch run (one-shot
  * fingerprints → one-shot per-modality Hamming pairs → one CC) over
  * every payload ever delivered — any slicing, batch boundaries
  * invisible — and replays must be byte-invisible to both standing
  * tables.
  */
class StreamingMediaSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val db = "graft_sm_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    super.afterAll()
  }

  /** The q194 fixture in miniature over ids 0..47: real PNGs for
    * ids %4 ∈ {0,2} (pixels keyed on the id's group-of-3, one pixel
    * perturbed for 2 of 3 members → within-group near-dups at
    * Hamming ≤ 4), real PCM WAVs for ids %4 = 1 (same scheme on
    * samples), real 3-frame MP4s for ids %8 = 3 (r20 — video in the
    * curation loop: pixels keyed on the VIDEO-ordinal group-of-3,
    * near-dup triples of their own), text payloads for ids %8 = 7
    * (routed away by the sniff).
    */
  private def media: DataFrame = {
    val docs = (0L until 48L).map(i => (i, s"text body $i", 10L + i % 7))
      .toDF("doc_id", "text", "n_chars")
    val did = col("doc_id")
    val base = did - pmod(did, lit(3L))
    val ipos = pmod(did * lit(13L), lit(72L))
    val pixels = flatten(transform(sequence(lit(0), lit(7)), y =>
      transform(sequence(lit(0), lit(8)), x => {
        val xl = x.cast("long"); val yl = y.cast("long")
        val i = yl * lit(9L) + xl
        val h = (base + lit(1L)) * lit(2654435761L) +
          xl * lit(97L) + yl * lit(1031L)
        val g = h.bitwiseXOR(shiftright(h, 7))
        val p = pmod(g * lit(31L) + shiftright(g, 11), lit(241L))
        when(pmod(did, lit(3L)) =!= lit(0L) && i === ipos,
          pmod(p + lit(128L), lit(241L))).otherwise(p).cast("int")
      })))
    val pngs = Multimodal.asGrayPngMediaTable(
      docs.filter(pmod(did, lit(4L)).isin(0L, 2L)), "doc_id", 9, 8, pixels)
    val apos = pmod(did * lit(13L), lit(520L))
    val samples = transform(sequence(lit(0), lit(519)), i => {
      val il = i.cast("long")
      val h = (base + lit(1L)) * lit(2654435761L) + il * lit(7349L)
      val g = h.bitwiseXOR(shiftright(h, 7))
      val raw = pmod(g * lit(31L) + shiftright(g, 11), lit(30000L))
      val rawP = when(pmod(did, lit(3L)) =!= lit(0L) && il === apos,
        pmod(raw + lit(9000L), lit(30000L))).otherwise(raw)
      (rawP - lit(15000L)).cast("int")
    })
    val wavs = Multimodal.asPcmWavMediaTable(
      docs.filter(pmod(did, lit(4L)) === 1L), "doc_id", 16000, samples)
    val vm = ((did - lit(3L)) / lit(8L)).cast("long")
    val vb = vm - pmod(vm, lit(3L))
    val vpos = pmod(did * lit(13L), lit(216L))
    val vpixels = flatten(transform(sequence(lit(0), lit(2)), f =>
      flatten(transform(sequence(lit(0), lit(7)), y =>
        transform(sequence(lit(0), lit(8)), x => {
          val xl = x.cast("long"); val yl = y.cast("long")
          val fl = f.cast("long")
          val i = fl * lit(72L) + yl * lit(9L) + xl
          val h = (vb + lit(1L)) * lit(2654435761L) +
            xl * lit(97L) + yl * lit(1031L) + fl * lit(761L)
          val g = h.bitwiseXOR(shiftright(h, 7))
          val p = pmod(g * lit(31L) + shiftright(g, 11), lit(241L))
          when(pmod(vm, lit(3L)) =!= lit(0L) && i === vpos,
            pmod(p + lit(128L), lit(241L))).otherwise(p).cast("int")
        })))))
    val mp4s = Multimodal.asMp4FramesMediaTable(
      docs.filter(pmod(did, lit(8L)) === 3L), "doc_id",
      timescale = 1000, w = 9, h = 8, nFrames = 3, pixels = vpixels)
    val texts = docs.filter(pmod(did, lit(8L)) === 7L)
      .select(did.cast("long").as("media_id"), lit("text").as("media_type"),
        encode(concat(lit("T "), col("text")), "UTF-8").as("payload"),
        lit(null).cast("int").as("meta_width"),
        lit(null).cast("int").as("meta_height"),
        lit(null).cast("long").as("meta_duration_ms"))
    pngs.unionByName(wavs).unionByName(mp4s).unionByName(texts)
  }

  /** The one-shot q194 labeling of the same corpus. */
  private def oneShotLabels: Set[(Long, Long)] = {
    val mimed = media.withColumn("mime",
      graft.ops.Mime.sniffMime(col("payload")))
    val pairs = Multimodal.imageNearDupPairs(
        mimed.filter(col("mime") === "image/png"), maxHamming = 4)
      .unionByName(Multimodal.audioNearDupPairs(
        mimed.filter(col("mime") === "audio/wav"), maxHamming = 4))
      .unionByName(Multimodal.videoNearDupPairs(
        mimed.filter(col("mime") === "video/mp4"), maxHamming = 4))
    Dedup.connectedComponents(pairs.select(col("id_a"), col("id_b")))
      .as[(Long, Long)].collect().toSet
  }

  private def payloadRows: Seq[(Long, Array[Byte])] =
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])].collect().toSeq

  private def runSlicing(slices: Seq[Seq[(Long, Array[Byte])]],
                         fpTable: String, labelTable: String): Unit = {
    val ccSink = StreamingCc.incrementalCcMergeSink(spark, db, labelTable,
      nBuckets = 8)()
    val sink = StreamingMedia.incrementalMediaDedupSink(spark, db, fpTable) {
      (pairs, bid) => ccSink(pairs.select(col("id_a"), col("id_b")), bid)
    }
    val input = MemoryStream[(Long, Array[Byte])]
    val q = input.toDF().toDF("media_id", "payload").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("smck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try slices.foreach { s => input.addData(s: _*); q.processAllAvailable() }
    finally q.stop()
  }

  test("streamed media labels equal the one-shot q194 labeling, any slicing") {
    val expected = oneShotLabels
    assert(expected.nonEmpty, "fixture must produce near-dup clusters")
    assert(expected.exists { case (id, _) => id % 8 == 3 },
      "video rows must participate in the labeling (r19 verdict #1)")
    val rows = payloadRows
    val slicings = Seq(
      Seq(rows),                                     // one batch
      rows.grouped(13).toSeq,                        // cross-batch merges
      rows.sortBy(_._1).reverse.grouped(9).toSeq)    // order-independence
    for ((slicing, i) <- slicings.zipWithIndex) {
      val (ft, lt) = (s"fp_$i", s"lb_$i")
      runSlicing(slicing, ft, lt)
      val got = StreamingCc.bucketedLabels(spark, db, lt)
        .as[(Long, Long)].collect().toSet
      assert(got === expected, s"slicing into ${slicing.size} batches")
      // the standing fingerprint table holds every decodable payload
      // exactly once — 8-byte identity, never payload bytes
      assert(spark.table(s"`$db`.`$ft`").count() ===
        media.count() - media.filter(col("media_type") === "text").count())
      graft.ops.CacheScope.release(spark)
    }
  }

  test("replayed media batch is byte-invisible to both standing tables") {
    val (ft, lt) = ("fp_r", "lb_r")
    val ccSink = StreamingCc.incrementalCcMergeSink(spark, db, lt,
      nBuckets = 8)()
    val sink = StreamingMedia.incrementalMediaDedupSink(spark, db, ft) {
      (pairs, bid) => ccSink(pairs.select(col("id_a"), col("id_b")), bid)
    }
    val rows = payloadRows
    val (b0, b1) = rows.splitAt(20)
    sink(b0.toDF("media_id", "payload"), 0L)
    sink(b1.toDF("media_id", "payload"), 1L)
    val fpBefore = spark.table(s"`$db`.`$ft`").collect().toSet
    val lbBefore = StreamingCc.bucketedLabels(spark, db, lt)
      .as[(Long, Long)].collect().toSet
    sink(b1.toDF("media_id", "payload"), 1L) // at-least-once replay
    assert(spark.table(s"`$db`.`$ft`").collect().toSet === fpBefore,
      "replay must not duplicate fingerprint rows")
    assert(StreamingCc.bucketedLabels(spark, db, lt)
      .as[(Long, Long)].collect().toSet === lbBefore,
      "replay must leave the label table unchanged")
    assert(lbBefore === oneShotLabels)
    graft.ops.CacheScope.release(spark)
  }
}
