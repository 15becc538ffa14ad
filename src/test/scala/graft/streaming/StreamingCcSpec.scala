package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Dedup

/** Streaming CC label maintenance: the standing label table after N
  * micro-batches must equal ONE `connectedComponents` run over every
  * pair ever delivered (batch boundaries invisible, any slicing),
  * replays must be no-ops, and the composed
  * StreamingDedup→StreamingCc→keepBest pipeline must match its batch
  * twin end to end.
  */
class StreamingCcSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val db = "graft_scc_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    super.afterAll()
  }

  // a graph with merges ACROSS batches: chain 1-2-3-4, triangle
  // 10-11-12, singleton edge 20-21, and a late edge 4-10 merging the
  // chain with the triangle
  private val allPairs = Seq(
    (1L, 2L), (3L, 4L), (2L, 3L), (10L, 11L), (11L, 12L), (20L, 21L),
    (4L, 10L), (12L, 10L))

  private def runSlicing(slices: Seq[Seq[(Long, Long)]], table: String)
      : Seq[(Long, Long, Long)] = {
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val sink = StreamingCc.incrementalCcSink(spark, db, table) {
      (bid, np, nl) => seen += ((bid, np, nl)); ()
    }
    val input = MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("id_a", "id_b").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sccck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try slices.foreach { s => input.addData(s: _*); q.processAllAvailable() }
    finally q.stop()
    seen.toSeq
  }

  test("label table after N batches equals one CC over all pairs, any slicing") {
    val expected = Dedup.connectedComponents(
        allPairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toSet
    val slicings = Seq(
      Seq(allPairs),                    // one batch = plain CC
      allPairs.grouped(3).toSeq,        // merge-across-batches path
      allPairs.map(Seq(_)))             // one edge per batch
    for ((slicing, i) <- slicings.zipWithIndex) {
      val table = s"scc_labels_$i"
      runSlicing(slicing, table)
      val got = spark.table(s"`$db`.`$table`")
        .as[(Long, Long)].collect().toSet
      assert(got === expected, s"slicing into ${slicing.size} batches")
    }
  }

  test("replaying the last batch is a byte-identical no-op (replay safety)") {
    val table = "scc_replay"
    val sink = StreamingCc.incrementalCcSink(spark, db, table)()
    sink(allPairs.take(5).toDF("id_a", "id_b"), 0L)
    sink(allPairs.drop(5).toDF("id_a", "id_b"), 1L)
    val before = spark.table(s"`$db`.`$table`").as[(Long, Long)].collect().toSet
    // Structured Streaming re-runs the most recent batchId after a
    // failure between the sink and the checkpoint commit: every edge
    // contracts to a self-loop, the delta CC sees an empty graph
    sink(allPairs.drop(5).toDF("id_a", "id_b"), 1L)
    val after = spark.table(s"`$db`.`$table`").as[(Long, Long)].collect().toSet
    assert(after === before, "replay must leave the label table unchanged")
    // duplicate pair delivery inside a fresh batch is absorbed the same way
    sink(Seq((1L, 2L), (2L, 1L)).toDF("id_a", "id_b"), 2L)
    assert(spark.table(s"`$db`.`$table`").as[(Long, Long)].collect().toSet
      === before, "redelivered pairs must be no-ops")
  }

  test("merge sink: changed-frame upsert equals the full fold, any slicing") {
    // the keyed-merge face must maintain the identical labeling
    val expected = Dedup.connectedComponents(
        allPairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toSet
    val slicings = Seq(
      Seq(allPairs),
      allPairs.grouped(3).toSeq,
      allPairs.map(Seq(_)))
    for ((slicing, i) <- slicings.zipWithIndex) {
      val table = s"scc_merge_$i"
      val sink = StreamingCc.incrementalCcMergeSink(spark, db, table,
        nBuckets = 8)()
      slicing.zipWithIndex.foreach { case (s, bid) =>
        sink(s.toDF("id_a", "id_b"), bid.toLong)
      }
      val got = StreamingCc.bucketedLabels(spark, db, table)
        .as[(Long, Long)].collect().toSet
      assert(got === expected, s"slicing into ${slicing.size} batches")
    }
  }

  test("merge sink: replay is a no-op and untouched buckets' files are never rewritten") {
    val table = "scc_merge_prune"
    val nBuckets = 8
    var lastTouched = -1L
    val sink = StreamingCc.incrementalCcMergeSink(spark, db, table,
      nBuckets = nBuckets) { (_, _, _, nb) => lastTouched = nb; () }
    sink(allPairs.take(6).toDF("id_a", "id_b"), 0L)

    def bucketFiles(): Map[String, Set[String]] = {
      val loc = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db)))
          .location.toString))
      Option(loc.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("bucket="))
        .map(d => d.getName -> Option(d.listFiles()).getOrElse(Array.empty)
          .map(f => s"${f.getName}:${f.length()}").toSet)
        .toMap
    }
    val before = bucketFiles()

    // REPLAY: every edge contracts to a self-loop, the changed frame
    // is empty, and the merge write must be a whole-batch no-op — not
    // one file of one bucket rewritten
    sink(allPairs.take(6).toDF("id_a", "id_b"), 0L)
    assert(lastTouched === 0L, "replayed batch must touch zero buckets")
    assert(bucketFiles() === before,
      "replay must not rewrite any bucket file")

    // a small delta: only the buckets its changed ids hash to may
    // change; every other bucket's files must be byte-identical
    val delta = Seq((4L, 10L))
    val preLabels = StreamingCc.bucketedLabels(spark, db, table)
      .as[(Long, Long)].collect().toSeq
    sink(delta.toDF("id_a", "id_b"), 1L)
    val changedIds = Dedup.connectedComponentsIncrementalChanged(
        preLabels.toDF("id", "label"), delta.toDF("id_a", "id_b"))
      .select("id").as[Long].collect()
    val after = bucketFiles()
    val touchedNames = spark.table(s"`$db`.`$table`")
      .filter(col("id").isin(changedIds.map(Long.box): _*))
      .select("bucket").distinct().as[Int].collect()
      .map(b => s"bucket=$b").toSet
    // the untouched majority is byte-identical
    for ((bname, files) <- before if !touchedNames.contains(bname))
      assert(after(bname) === files, s"$bname was rewritten without a change")
    assert(lastTouched > 0L && lastTouched <= touchedNames.size.toLong,
      s"touched-bucket count $lastTouched vs ${touchedNames.size}")
    // and the labeling is still the full fold's
    val expected = Dedup.connectedComponents(
        (allPairs.take(6) ++ delta).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toSet
    assert(StreamingCc.bucketedLabels(spark, db, table)
      .as[(Long, Long)].collect().toSet === expected)
  }

  test("connectedComponentsIncrementalChanged: old - changed + changed = full fold") {
    // the upsert-delta invariant the merge write relies on, checked as
    // a plain frame identity on a merge-across-batches step
    val old = Dedup.connectedComponents(
      allPairs.take(6).toDF("id_a", "id_b"))
    val delta = allPairs.drop(6).toDF("id_a", "id_b")
    val full = Dedup.connectedComponentsIncremental(old, delta)
      .as[(Long, Long)].collect().toSet
    val changed = Dedup.connectedComponentsIncrementalChanged(old, delta)
    val applied = old.join(changed.select("id"), Seq("id"), "left_anti")
      .unionByName(changed.select(col("id"), col("label")))
      .as[(Long, Long)].collect().toSet
    assert(applied === full, "keyed merge of the changed frame must equal the full fold")
    // is_new marks exactly the rows absent from the standing table
    val newIds = changed.filter(col("is_new")).select("id").as[Long].collect().toSet
    val oldIds = old.select("id").as[Long].collect().toSet
    assert(newIds.forall(!oldIds.contains(_)))
    assert(changed.filter(!col("is_new")).select("id").as[Long].collect()
      .forall(oldIds.contains))
    // changed is delta-component-sized: nothing from the untouched
    // component (20,21) appears
    assert(!changed.select("id").as[Long].collect().exists(Set(20L, 21L)))
  }

  test("composed pipeline: StreamingDedup pairs -> label table -> keepBest equals batch") {
    // the full ingest-path regime: documents stream in, the dedup sink
    // emits each batch's pair delta (cross-batch via the signature
    // index), the CC sink folds the delta into the label table, and
    // keepBest over (corpus table, label table) must equal the batch
    // dedupByPairsScored over the whole corpus
    val labelSink = StreamingCc.incrementalCcSink(spark, db, "scc_e2e_labels")()
    val sink = StreamingDedup.incrementalDedupSink(spark, db,
        "scc_e2e_corpus", "scc_e2e_index", "doc_id", "text",
        shingleN = 5, k = 32, bands = 16, threshold = 0.5) {
      (pairs, batchId) => labelSink(pairs, batchId)
    }
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different content about spark engines"),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (5L, "unrelated short text"),
      (6L, "completely different content about spark engine"))
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("scce2e").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try docs.grouped(2).foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    // batch twin over the SAME pair semantics: minhash pairs over the
    // full corpus at identical parameters
    val corpus = docs.toDF("doc_id", "text")
    val batchPairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
      shingleN = 5, k = 32, bands = 16, threshold = 0.5)
      .select(col("id_a"), col("id_b"))
    val expectedLabels = Dedup.connectedComponents(batchPairs)
      .as[(Long, Long)].collect().toSet
    val gotLabels = StreamingCc.labels(spark, db, "scc_e2e_labels")
      .as[(Long, Long)].collect().toSet
    assert(gotLabels === expectedLabels,
      "streamed labels must equal batch CC over the full corpus's pairs")

    // keep-best view over the MAINTAINED table ≡ the one-shot batch op
    val scored = spark.table(s"`$db`.`scc_e2e_corpus`")
      .select(col("id").as("doc_id"), col("text"),
        length(col("text")).cast("long").as("score"))
    val streamedKeep = StreamingCc.keepBest(spark, db, "scc_e2e_labels",
        scored, "doc_id", "score")
      .select("doc_id").as[Long].collect().toSet
    val batchKeep = Dedup.dedupByPairsScored(scored, "doc_id", "score",
        batchPairs)
      .select("doc_id").as[Long].collect().toSet
    assert(streamedKeep === batchKeep,
      "keepBest over maintained labels must equal the batch keep-policy")
  }
}
