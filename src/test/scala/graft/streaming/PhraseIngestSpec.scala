package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Retrieval

/** Streaming positional-index maintenance: the standing table after N
  * micro-batches must answer phrase queries byte-equal to
  * `phraseMatch` over every document ever ingested (any slicing), and
  * a replayed batch must be a no-op.
  */
class PhraseIngestSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val db = "graft_phrase_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    super.afterAll()
  }

  private val docs = Seq(
    (1L, "big order scan runs"), (2L, "order scan order scan"),
    (3L, "scan order"), (4L, ""), (5L, "order scan"))
  private val phrase = Seq("order", "scan")

  private def direct(rows: Seq[(Long, String)]) =
    Retrieval.phraseMatch(rows.toDF("doc_id", "text"), "doc_id", "text", phrase)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq

  test("standing index equals phraseMatch over all ingested docs, any slicing") {
    val want = direct(docs)
    val slicings = Seq(Seq(docs), docs.grouped(2).toSeq, docs.map(Seq(_)))
    for ((slicing, i) <- slicings.zipWithIndex) {
      val t = s"p_$i"
      val sink = PhraseIngest.positionalIndexSink(spark, db, t,
        "doc_id", "text")()
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch(sink)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("phck").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
        .start()
      try slicing.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      val got = PhraseIngest.phraseMatch(spark, db, t, phrase)
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      assert(got === want, s"slicing into ${slicing.size} batches")
      graft.ops.CacheScope.release(spark)
    }
  }

  test("replayed batch is a no-op; zero-token batch appends nothing") {
    val sink = PhraseIngest.positionalIndexSink(spark, db, "rp",
      "doc_id", "text")()
    sink(docs.take(3).toDF("doc_id", "text"), 0L)
    val before = spark.table(s"`$db`.`rp`").collect().toSet
    sink(docs.take(3).toDF("doc_id", "text"), 0L) // full replay
    assert(spark.table(s"`$db`.`rp`").collect().toSet === before)
    sink(Seq((9L, ""), (10L, "  ")).toDF("doc_id", "text"), 1L)
    assert(spark.table(s"`$db`.`rp`").collect().toSet === before,
      "zero-token batch must append nothing")
    graft.ops.CacheScope.release(spark)
  }
}
