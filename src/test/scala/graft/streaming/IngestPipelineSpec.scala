package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end streaming ingest: gate → redact → dedup-vs-history →
  * corpus append, across micro-batches. The properties that only the
  * composition can break: gated-out docs never reach the index, stored
  * text is redacted BEFORE the dedup comparison, and cross-batch
  * near-dups still surface after redaction.
  */
class IngestPipelineSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val db = "graft_ingest_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    super.afterAll()
  }

  // passes the gate: >200 chars, stopword-bearing, ordinary token lengths
  private def goodDoc(tail: String): String =
    ("the data pipeline is a set of stages that move and transform " +
      "records from a source to a sink and it is built to keep the " +
      "results of each stage correct and fast for all of the users " +
      "that depend on it every day ") + tail

  test("gate, redaction, and cross-batch dedup compose in one ingest loop") {
    // r12 deflake: asserts are BATCH-ID-AGNOSTIC. The r11 full-suite
    // flake read pairsByBatch(1L) == Set((1,3)) and saw Set() — which
    // is exactly what a batch-id shift produces (a no-data micro-batch
    // or a trigger-race split consuming an id, pushing the real work
    // to a later id) without any product bug. The properties that
    // matter don't depend on WHICH micro-batch did the work: the pair
    // is found only after doc 3 arrives (phase 2), never before
    // (phase 1), and the gate drop count totals 1.
    val phase1Pairs = scala.collection.mutable.Set[(Long, Long)]()
    val allPairs = scala.collection.mutable.Set[(Long, Long)]()
    val dropped = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var phase2 = false
    val sink = IngestPipeline.trainingIngestSink(spark, db,
        "ing_corpus", "ing_index", "doc_id", "text",
        shingleN = 5, k = 32, bands = 16, threshold = 0.5) {
      (pairs, droppedCt, _) =>
        val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
        if (!phase2) phase1Pairs ++= got
        allPairs ++= got
        dropped.addAndGet(droppedCt); ()
    }
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ingck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
    try {
      // phase 1: one good doc (with an email to scrub) + one gate reject
      input.addData(
        (1L, goodDoc("reach us at ops@example.com for help")),
        (2L, "tiny"))
      q.processAllAvailable()
      phase2 = true
      // phase 2: a near-dup of doc 1 — different contact address, so the
      // match must happen on the REDACTED text
      input.addData(
        (3L, goodDoc("reach us at other.person@elsewhere.org for help")))
      q.processAllAvailable()
    } finally q.stop()

    assert(dropped.get() == 1L, s"gate should drop exactly doc 2: ${dropped.get()}")
    assert(phase1Pairs.isEmpty,
      s"no pair may surface before doc 3 arrives: $phase1Pairs")
    assert(allPairs.toSet == Set((1L, 3L)),
      s"cross-batch near-dup of the redacted docs expected: $allPairs")

    // the rejected doc never entered corpus or index
    val corpus = spark.table(s"`$db`.`ing_corpus`")
    assert(corpus.count() == 2L)
    assert(corpus.filter($"id" === 2L).count() == 0L)
    assert(spark.table(s"`$db`.`ing_index`").filter($"id" === 2L).count() == 0L)

    // stored text is scrubbed — no raw addresses anywhere in the corpus
    val texts = corpus.select("text").as[String].collect()
    assert(texts.forall(t => t.contains("<EMAIL>") && !t.contains("@example.com")
      && !t.contains("@elsewhere.org")), texts.mkString("; "))
  }

  test("contamination list blocks matching docs from the corpus, matched on redacted form") {
    // the incoming doc carries raw PII; the contamination list stores
    // the REDACTED form (as a published benchmark would) — the match
    // only fires if decontamination runs AFTER redaction
    val incoming = goodDoc(
      "benchmark item from eval.owner@example.com what is the answer to item 7")
    val contamList = Seq(
      goodDoc("benchmark item from <EMAIL> what is the answer to item 7"),
      // RAW-form entry (r17 review): a benchmark list that still
      // carries its own PII must match too — the sink redacts the
      // KEYS with the same redaction it applies to the corpus, so
      // raw-form and redacted-form lists both work (and redaction is
      // idempotent on the already-redacted entry above)
      goodDoc("second eval item mailto probe@bench.org answer is blue"),
      "some other benchmark item never seen in the stream")
      .toDF("bad_text")
    val dropped = new java.util.concurrent.atomic.AtomicLong(0L)
    val sink = IngestPipeline.trainingIngestSink(spark, db,
        "ing2_corpus", "ing2_index", "doc_id", "text",
        shingleN = 5, k = 32, bands = 16, threshold = 0.5,
        contam = Some((contamList, "bad_text"))) {
      (pairs, droppedCt, _) =>
        pairs.count(); dropped.addAndGet(droppedCt); ()
    }
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ingck2").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        (1L, incoming),                      // matches after redaction
        (2L, goodDoc("a perfectly ordinary clean document body")),
        (3L, "tiny"),                        // gate reject
        // carries a DIFFERENT raw email than the raw-form list entry —
        // both redact to the same <EMAIL> placeholder, so the match
        // fires exactly because keys and corpus pass the same redaction
        (4L, goodDoc("second eval item mailto someone.else@other.net answer is blue")))
      q.processAllAvailable()
    } finally q.stop()

    assert(dropped.get() == 3L,
      s"gate reject + two contamination matches: ${dropped.get()}")
    val corpus = spark.table(s"`$db`.`ing2_corpus`")
    assert(corpus.select("id").as[Long].collect().toSet == Set(2L))
  }

  test("LM gate drops out-of-distribution docs; model trained once at sink creation") {
    // reference corpus: ordinary English (the model's in-distribution);
    // the junk doc passes the SURFACE gate (length, stopwords via its
    // header) but its body bigrams are unseen -> every position backs
    // off to unigram-floor probability and the mean ln P collapses
    val ref = (0L until 20L)
      .map(i => (1000L + i, goodDoc(s"variant number $i of the reference")))
      .toDF("doc_id", "text")
    val junk = goodDoc((1 to 40)
      .map(i => s"zzq$i qxz${i * 7} vvk${i * 13}").mkString(" "))
    val dropped = new java.util.concurrent.atomic.AtomicLong(0L)
    val sink = IngestPipeline.trainingIngestSink(spark, db,
        "ing3_corpus", "ing3_index", "doc_id", "text",
        shingleN = 5, k = 32, bands = 16, threshold = 0.5,
        // mean-lnP floor -3.0: the clean doc scores ~-0.7 (mostly seen
        // bigrams), the junk doc ~-5.4 (its ~2/3 unseen positions sit
        // at the ~-8.1 backoff floor) — both sides have >2e6 slack
        lmGate = Some((ref, -3000000L))) {
      (pairs, droppedCt, _) =>
        pairs.count(); dropped.addAndGet(droppedCt); ()
    }
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ingck3").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        (1L, goodDoc("a clean in-distribution document about the data pipeline")),
        (2L, junk),
        (3L, "tiny"))                        // surface-gate reject
      q.processAllAvailable()
    } finally q.stop()

    assert(dropped.get() == 2L,
      s"surface reject + LM reject expected: ${dropped.get()}")
    val corpus = spark.table(s"`$db`.`ing3_corpus`")
    assert(corpus.select("id").as[Long].collect().toSet == Set(1L),
      "only the in-distribution doc may reach the corpus")
  }
}
