package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Retrieval

/** Streaming BM25 index maintenance: the standing index after N
  * micro-batches must answer queries byte-equal to `bm25TopK` over
  * every document ever ingested (any slicing), and replays of either
  * failure window must leave both tables byte-identical.
  */
class Bm25IngestSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val db = "graft_bm25_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    super.afterAll()
  }

  private val docs = Seq(
    (1L, "cat dog"), (2L, "cat cat cat"), (3L, "bird"),
    (4L, "dog dog bird fish fox"), (5L, ""), (6L, "fox fish cat"))
  private val terms = Seq("cat", "bird", "fox")

  test("standing index equals bm25TopK over all ingested docs, any slicing") {
    val direct = Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
        "doc_id", "text", terms, topK = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val slicings = Seq(Seq(docs), docs.grouped(2).toSeq, docs.map(Seq(_)))
    for ((slicing, i) <- slicings.zipWithIndex) {
      val (pt, st) = (s"p_$i", s"s_$i")
      val sink = Bm25Ingest.bm25IndexSink(spark, db, pt, st,
        "doc_id", "text")()
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch(sink)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("bm25ck").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
        .start()
      try slicing.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      val got = Bm25Ingest.topK(spark, db, pt, st, terms, topKn = 10)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got === direct, s"slicing into ${slicing.size} batches")
      graft.ops.CacheScope.release(spark)
    }
  }

  test("replay safety: both failure windows leave the tables byte-identical") {
    val sink = Bm25Ingest.bm25IndexSink(spark, db, "rp", "rs",
      "doc_id", "text")()
    sink(docs.take(3).toDF("doc_id", "text"), 0L)
    sink(docs.drop(3).toDF("doc_id", "text"), 1L)
    val pBefore = spark.table(s"`$db`.`rp`").collect().toSet
    val sBefore = spark.table(s"`$db`.`rs`").collect().toSet
    // window A: failure AFTER both appends, before checkpoint commit —
    // full replay of batch 1 must be a no-op (stats marker present)
    sink(docs.drop(3).toDF("doc_id", "text"), 1L)
    assert(spark.table(s"`$db`.`rp`").collect().toSet === pBefore)
    assert(spark.table(s"`$db`.`rs`").collect().toSet === sBefore)
    // window B: failure BETWEEN the postings append and the stats
    // append — simulate by appending batch 2's postings only, then
    // replaying through a FRESH sink instance (a real window-B crash
    // kills the process; the restarted sink re-reads the standing
    // counts, which is what makes the single-writer barrier sound):
    // postings must not duplicate, the missing stats row must land
    val b2 = Seq((7L, "cat bird extra"), (8L, "fox")).toDF("doc_id", "text")
    Retrieval.bm25Postings(b2, "doc_id", "text")
      .withColumn("__batch_id", lit(2L))
      .write.mode("append").insertInto(s"`$db`.`rp`")
    spark.catalog.refreshTable(s"$db.rp")
    val pMid = spark.table(s"`$db`.`rp`").collect().toSet
    val sink2 = Bm25Ingest.bm25IndexSink(spark, db, "rp", "rs",
      "doc_id", "text")()
    sink2(b2, 2L)
    assert(spark.table(s"`$db`.`rp`").collect().toSet === pMid,
      "replay must not duplicate postings rows")
    assert(spark.table(s"`$db`.`rs`")
      .filter(col("__batch_id") === 2L).count() === 1L,
      "the missing stats marker must land on replay")
    // and the index now answers as if all 8 docs were one batch
    val direct = Retrieval.bm25TopK(
        (docs ++ Seq((7L, "cat bird extra"), (8L, "fox")))
          .toDF("doc_id", "text"), "doc_id", "text", terms, topK = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val got = Bm25Ingest.topK(spark, db, "rp", "rs", terms, topKn = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === direct)
    graft.ops.CacheScope.release(spark)
  }
}
