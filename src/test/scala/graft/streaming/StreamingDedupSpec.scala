package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming incremental dedup: batch N+1's documents must be checked
  * against batches 1..N via the accumulated signature index — the
  * cross-batch pair is the property that distinguishes this from
  * per-batch-only dedup.
  */
class StreamingDedupSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val db = "graft_sdedup_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    super.afterAll()
  }

  test("micro-batches dedup against all previously seen documents") {
    val collected = scala.collection.mutable.Map[Long, Set[(Long, Long)]]()
    val sink = StreamingDedup.incrementalDedupSink(spark, db,
        "sd_corpus", "sd_index", "doc_id", "text",
        shingleN = 5, k = 32, bands = 16, threshold = 0.5) {
      (pairs, batchId) =>
        collected(batchId) = pairs.select("id_a", "id_b")
          .as[(Long, Long)].collect().toSet
    }
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sdck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()

    // batch 0: an exact dup WITHIN the batch, plus an unrelated doc
    input.addData(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different content about spark engines"))
    q.processAllAvailable()
    // batch 1: a near-dup of docs seen ONE BATCH AGO
    input.addData((3L, "the quick brown fox jumps over the lazy cat"))
    q.processAllAvailable()
    // batch 2: unrelated — must produce no pairs
    input.addData((5L, "unrelated short text"))
    q.processAllAvailable(); q.stop()

    assert(collected(0L) == Set((1L, 2L)),
      s"within-batch exact dup expected in batch 0: ${collected(0L)}")
    assert(collected(1L) == Set((1L, 3L), (2L, 3L)),
      s"cross-batch near-dups against the index expected: ${collected(1L)}")
    assert(collected(2L) == Set.empty,
      s"unrelated doc must match nothing: ${collected(2L)}")

    // the index accumulated every document seen
    assert(spark.table(s"`$db`.`sd_index`").count() == 5L)
    assert(spark.table(s"`$db`.`sd_corpus`").count() == 5L)
  }

  test("rows-proportional appends write multiple files and keep the barrier invariant") {
    // rowsPerFile=2 forces the multi-file path on a 5-row batch
    // (⌈5/2⌉ = 3 coalesced tasks) — the r12 sink serialized every
    // batch through coalesce(1); this locks the scale path: appends
    // may span files, but the visibility barrier must still see the
    // exact cumulative counts and cross-batch dedup must still fire.
    val collected = scala.collection.mutable.Map[Long, Set[(Long, Long)]]()
    val sink = StreamingDedup.incrementalDedupSink(spark, db,
        "sd_mf_corpus", "sd_mf_index", "doc_id", "text",
        shingleN = 5, k = 32, bands = 16, threshold = 0.5,
        rowsPerFile = 2L) {
      (pairs, batchId) =>
        collected(batchId) = pairs.select("id_a", "id_b")
          .as[(Long, Long)].collect().toSet
    }
    val input = MemoryStream[(Long, String)]
    // three addData blocks BEFORE start → ONE first batch with three
    // partitions (MemoryStream gives each block a partition), so
    // coalesce(⌈5/2⌉=3) genuinely keeps >1 write task — coalesce caps
    // parallelism and never raises it, which is exactly the scale
    // contract (a Kafka micro-batch arrives already multi-partition)
    input.addData(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta"))
    input.addData(
      (12L, "one two three four five six seven eight nine"),
      (13L, "red orange yellow green blue indigo violet colors"))
    input.addData(
      (14L, "north south east west compass directions here now"))
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sdck2").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    // cross-batch: near-dup of batch-0 doc through the standing index
    input.addData((15L, "alpha beta gamma delta epsilon zeta eta iota"))
    q.processAllAvailable(); q.stop()

    assert(collected(0L) == Set((10L, 11L)),
      s"within-batch exact dup expected: ${collected(0L)}")
    assert(collected(1L) == Set((10L, 15L), (11L, 15L)),
      s"cross-batch near-dups through multi-file index expected: ${collected(1L)}")
    assert(spark.table(s"`$db`.`sd_mf_index`").count() == 6L)
    assert(spark.table(s"`$db`.`sd_mf_corpus`").count() == 6L)
    // the batch really did span files: 5 rows at rowsPerFile=2 → up to
    // 3 data files in the first append (coalesce caps, so assert >1)
    val corpusFiles = new java.io.File(
      spark.sql(s"DESCRIBE TABLE EXTENDED `$db`.`sd_mf_corpus`")
        .filter($"col_name" === "Location").head().getString(1)
        .stripPrefix("file:")).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(corpusFiles > 1,
      s"expected the 5-row batch to write multiple corpus files, saw $corpusFiles")
  }
}
