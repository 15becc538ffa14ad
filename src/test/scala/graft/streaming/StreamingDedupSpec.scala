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
}
