package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.LmScore

/** Streaming LM count maintenance: a model assembled from the standing
  * count tables after N micro-batches must score byte-equal to one
  * trained on every document ever ingested (any slicing), and replays
  * of either failure window must leave both tables byte-identical.
  */
class LmIngestSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val db = "graft_lm_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    super.afterAll()
  }

  private val ref = Seq(
    (1L, "the cat sat on the mat"), (2L, "the cat ate"),
    (3L, "a dog sat"), (4L, ""), (5L, "the the the"),
    (6L, "dog ate the bone"))
  private val scoreDocs = Seq(
    (10L, "the cat sat"), (11L, "a dog ate the mat"), (12L, "unseen words here"))
    .toDF("doc_id", "text")

  private def scores(m: LmScore.BigramModel) =
    LmScore.scoreWithModel(scoreDocs, m, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq

  test("standing model equals one-shot training over all ingested docs, any slicing") {
    val direct = scores(
      LmScore.trainBigramModel(ref.toDF("doc_id", "text"), "doc_id", "text"))
    val slicings = Seq(Seq(ref), ref.grouped(2).toSeq, ref.map(Seq(_)))
    for ((slicing, i) <- slicings.zipWithIndex) {
      val (ut, bt) = (s"u_$i", s"b_$i")
      val sink = LmIngest.lmCountSink(spark, db, ut, bt, "doc_id", "text")()
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch(sink)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("lmck").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
        .start()
      try slicing.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      val got = scores(LmIngest.model(spark, db, ut, bt))
      assert(got === direct, s"slicing into ${slicing.size} batches")
      graft.ops.CacheScope.release(spark)
    }
  }

  test("a non-empty batch of zero-token documents is a whole-batch no-op") {
    val sink = LmIngest.lmCountSink(spark, db, "zu", "zb", "doc_id", "text")()
    sink(Seq((1L, "the cat")).toDF("doc_id", "text"), 0L)
    val uBefore = spark.table(s"`$db`.`zu`").collect().toSet
    // all texts tokenize to nothing: no counts AND no marker rows —
    // the sink must skip the batch whole (and keep skipping on replay)
    sink(Seq((2L, ""), (3L, "   ")).toDF("doc_id", "text"), 1L)
    sink(Seq((2L, ""), (3L, "   ")).toDF("doc_id", "text"), 1L)
    assert(spark.table(s"`$db`.`zu`").collect().toSet === uBefore)
    assert(spark.table(s"`$db`.`zb`").filter(col("__batch_id") === 1L).isEmpty)
    graft.ops.CacheScope.release(spark)
  }

  test("replay safety: both failure windows leave the tables byte-identical") {
    val sink = LmIngest.lmCountSink(spark, db, "ru", "rb", "doc_id", "text")()
    sink(ref.take(3).toDF("doc_id", "text"), 0L)
    sink(ref.drop(3).toDF("doc_id", "text"), 1L)
    val uBefore = spark.table(s"`$db`.`ru`").collect().toSet
    val bBefore = spark.table(s"`$db`.`rb`").collect().toSet
    // window A: failure after both appends — full replay of batch 1
    // must be a no-op (the unigram commit marker is present)
    sink(ref.drop(3).toDF("doc_id", "text"), 1L)
    assert(spark.table(s"`$db`.`ru`").collect().toSet === uBefore)
    assert(spark.table(s"`$db`.`rb`").collect().toSet === bBefore)
    // window B: failure between the bigram append and the unigram
    // append — seed batch 2's bigrams only, then replay through a
    // FRESH sink instance: bigrams must not duplicate, the missing
    // unigram rows must land
    val b2 = Seq((7L, "cat bone cat"), (8L, "solo")).toDF("doc_id", "text")
    LmScore.bigramCounts(b2, "doc_id", "text")
      .withColumn("__batch_id", lit(2L))
      .write.mode("append").insertInto(s"`$db`.`rb`")
    spark.catalog.refreshTable(s"$db.rb")
    val bMid = spark.table(s"`$db`.`rb`").collect().toSet
    val sink2 = LmIngest.lmCountSink(spark, db, "ru", "rb", "doc_id", "text")()
    sink2(b2, 2L)
    assert(spark.table(s"`$db`.`rb`").collect().toSet === bMid,
      "replay must not duplicate bigram rows")
    assert(spark.table(s"`$db`.`ru`")
      .filter(col("__batch_id") === 2L).count() > 0L,
      "the missing unigram rows must land on replay")
    // and the standing model now scores as if all 8 docs were one corpus
    val direct = scores(LmScore.trainBigramModel(
      (ref ++ Seq((7L, "cat bone cat"), (8L, "solo"))).toDF("doc_id", "text"),
      "doc_id", "text"))
    assert(scores(LmIngest.model(spark, db, "ru", "rb")) === direct)
    graft.ops.CacheScope.release(spark)
  }
}
