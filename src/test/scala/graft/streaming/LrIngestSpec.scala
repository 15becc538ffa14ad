package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.QualityClassifier

/** Streaming classifier-feature maintenance: a model trained from the
  * standing count table after N micro-batches must score byte-equal to
  * one trained from scratch on every document ever ingested (any
  * slicing), and replays must leave the table byte-identical — the
  * LmIngest additivity contract transplanted to the classifier's
  * labeled token counts.
  */
class LrIngestSpec extends SparkSpec {
  import spark.implicits._

  private val db = "graft_lr_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    super.afterAll()
  }

  // balanced planted fixture: marker tokens carry the class, shared
  // noise tokens ride every doc
  private val docs = Seq(
    (0L, "alpha beta pos pos", 1L), (1L, "beta gamma pos", 1L),
    (2L, "alpha gamma neg neg", 0L), (3L, "beta neg", 0L),
    (4L, "gamma alpha pos", 1L), (5L, "alpha neg neg neg", 0L),
    (6L, "beta beta pos pos", 1L), (7L, "gamma neg", 0L))
  private val scoreDocs = Seq(
    (10L, "pos pos alpha"), (11L, "neg gamma"), (12L, "unseen words"))
    .toDF("doc_id", "text")

  private def scores(m: QualityClassifier.LogisticModel): Seq[(Long, Long, Long, Boolean)] =
    QualityClassifier.scoreLogistic(scoreDocs, m, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq

  private def ingest(slices: Seq[Seq[(Long, String, Long)]],
                     table: String): Unit = {
    val sink = LrIngest.lrCountSink(spark, db, table, "doc_id", "text", "y")()
    slices.zipWithIndex.foreach { case (b, i) =>
      sink(b.toDF("doc_id", "text", "y"), i.toLong)
    }
  }

  test("retrain from maintained counts equals from-scratch training, any slicing") {
    val direct = QualityClassifier.trainLogistic(
      docs.toDF("doc_id", "text", "y"), "doc_id", "text", "y")
    val want = (direct.biasE6, scores(direct))
    val slicings = Seq(Seq(docs), docs.grouped(3).toSeq, docs.map(Seq(_)))
    for ((slicing, i) <- slicings.zipWithIndex) {
      val t = s"c_$i"
      ingest(slicing, t)
      val m = LrIngest.retrain(spark, db, t)
      assert((m.biasE6, scores(m)) === want,
        s"slicing into ${slicing.size} batches")
      graft.ops.CacheScope.release(spark)
    }
  }

  test("replayed batch is a whole-batch no-op; zero-token batch appends nothing") {
    val t = "r_0"
    val sink = LrIngest.lrCountSink(spark, db, t, "doc_id", "text", "y")()
    sink(docs.take(4).toDF("doc_id", "text", "y"), 0L)
    val before = spark.table(s"`$db`.`$t`").collect().toSet
    sink(docs.take(4).toDF("doc_id", "text", "y"), 0L) // replay
    assert(spark.table(s"`$db`.`$t`").collect().toSet === before)
    sink(Seq((20L, "", 1L), (21L, "   ", 0L)).toDF("doc_id", "text", "y"), 1L)
    sink(Seq((20L, "", 1L), (21L, "   ", 0L)).toDF("doc_id", "text", "y"), 1L)
    assert(spark.table(s"`$db`.`$t`").collect().toSet === before)
    graft.ops.CacheScope.release(spark)
  }

  test("drift monitor: per-batch confidence rows, drift fires on collapse, replay is a no-op") {
    val t = "mon_0"
    val model = QualityClassifier.trainLogistic(
      docs.toDF("doc_id", "text", "y"), "doc_id", "text", "y")
    def confOf(rows: Seq[(Long, String)]): Long =
      QualityClassifier.scoreConfidenceE6(
        QualityClassifier.scoreLogistic(rows.toDF("doc_id", "text"),
          model, "doc_id", "text")).head().getLong(1)
    // baseline = the in-regime confidence (marker tokens present)
    val inRegime = docs.map { case (id, tx, _) => (id + 100L, tx) }
    val offRegime = docs.map { case (id, _, y) =>
      (id + 200L, if (y == 1L) "xmk xmk noise" else "zmk zmk noise") }
    val base = confOf(inRegime)
    assert(base > 0L, "fixture must give a nonzero baseline confidence")
    assert(confOf(offRegime) * 2L < base,
      "fixture must collapse confidence under unseen markers")
    val drifts = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val sink = LrIngest.driftMonitorSink(spark, db, t, model, base,
      "doc_id", "text") { (b, c) => drifts += ((b, c)); () }
    sink(inRegime.toDF("doc_id", "text"), 0L)
    sink(offRegime.toDF("doc_id", "text"), 1L)
    sink(offRegime.toDF("doc_id", "text"), 1L) // at-least-once replay
    val rows = spark.table(s"`$db`.`$t`")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(rows === Seq(
      (0L, inRegime.size.toLong, confOf(inRegime), false),
      (1L, offRegime.size.toLong, confOf(offRegime), true)))
    assert(drifts.toSeq === Seq((1L, confOf(offRegime)),
        (1L, confOf(offRegime))),
      "onDrift is at-LEAST-once (r19 ADVICE): it fires on the drifted " +
        "batch AND on its replay (a crash between row append and hook " +
        "must not lose the retrain trigger; retrain is idempotent) — " +
        "never on the in-regime batch")
    graft.ops.CacheScope.release(spark)
  }

  test("closed drift loop: monitor trips, onDrift retrains from standing counts, recovery") {
    val (ct, mt, mt2) = ("loop_c", "loop_m", "loop_m2")
    // baseline regime ingests through the count sink (tokenize once)
    val countSink = LrIngest.lrCountSink(spark, db, ct,
      "doc_id", "text", "y")()
    docs.grouped(4).zipWithIndex.foreach { case (b, i) =>
      countSink(b.toDF("doc_id", "text", "y"), i.toLong)
    }
    val m0 = LrIngest.retrain(spark, db, ct)
    def conf(m: QualityClassifier.LogisticModel,
             rows: Seq[(Long, String)]): Long =
      QualityClassifier.scoreConfidenceE6(
        QualityClassifier.scoreLogistic(rows.toDF("doc_id", "text"),
          m, "doc_id", "text")).head().getLong(1)
    val inRegime = docs.map { case (id, tx, _) => (id + 100L, tx) }
    val newRegime = docs.map { case (id, _, y) =>
      (id + 200L, if (y == 1L) "xmk xmk noise" else "zmk zmk noise") }
    val base = conf(m0, inRegime)
    // the CLOSED loop (r19 verdict next #6): the monitor's trigger IS
    // LrIngest.retrain over the standing counts — by trip time those
    // include the new regime's labeled examples (ingest runs beside
    // the monitor), so the refresh re-tokenizes nothing
    var retrained: Option[QualityClassifier.LogisticModel] = None
    val monitor = LrIngest.driftMonitorSink(spark, db, mt, m0, base,
      "doc_id", "text") { (_, _) =>
      retrained = Some(LrIngest.retrain(spark, db, ct))
    }
    monitor(inRegime.toDF("doc_id", "text"), 0L)
    assert(retrained.isEmpty, "in-regime traffic must not trip the loop")
    // the regime shifts: labeled new-regime examples land in the count
    // table; unlabeled new-regime traffic hits the monitor and trips it
    val newLabeled = docs.map { case (id, _, y) =>
      (id + 300L, if (y == 1L) "xmk xmk noise" else "zmk zmk noise", y) }
    countSink(newLabeled.toDF("doc_id", "text", "y"), 10L)
    monitor(newRegime.toDF("doc_id", "text"), 1L)
    assert(retrained.nonEmpty, "drifted traffic must fire the retrain")
    val m1 = retrained.get
    // the refreshed model equals a from-scratch train over EVERYTHING
    // ever ingested (the additivity contract through the loop)
    val scratch = QualityClassifier.trainLogistic(
      (docs ++ newLabeled).toDF("doc_id", "text", "y"),
      "doc_id", "text", "y")
    assert((m1.biasE6, scores(m1)) === ((scratch.biasE6, scores(scratch))))
    // recovery, operationally: the refreshed model classifies the new
    // regime correctly and a monitor re-anchored on it reports the
    // same traffic as drift=false — the drift=true -> retrain ->
    // drift=false sequence
    val preds = QualityClassifier.scoreLogistic(
        newRegime.toDF("doc_id", "text"), m1, "doc_id", "text")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._4)).toMap
    val wantPos = newRegime.map { case (id, tx) => id -> tx.startsWith("xmk") }
    assert(wantPos.forall { case (id, want) => preds(id) == want },
      "refreshed model must separate the new regime's markers")
    val monitor2 = LrIngest.driftMonitorSink(spark, db, mt2, m1,
      conf(m1, newLabeled.map { case (id, tx, _) => (id, tx) }),
      "doc_id", "text")()
    monitor2(newRegime.toDF("doc_id", "text"), 0L)
    val rows2 = spark.table(s"`$db`.`$mt2`")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(rows2.map(r => (r._1, r._4)) === Seq((0L, false)),
      "re-anchored monitor must not re-trip on the recovered regime")
    graft.ops.CacheScope.release(spark)
  }

  test("hashing-trick ingest: bucketed standing counts train the bucketed model") {
    val t = "b_0"
    val sink = LrIngest.lrCountSink(spark, db, t, "doc_id", "text", "y",
      nBuckets = 1L << 30)()
    docs.grouped(4).zipWithIndex.foreach { case (b, i) =>
      sink(b.toDF("doc_id", "text", "y"), i.toLong)
    }
    // collision-free bucket count reproduces the unbucketed scores
    // exactly under bucketed scoring (the q195 LrProbe contract)
    val direct = QualityClassifier.trainLogistic(
      docs.toDF("doc_id", "text", "y"), "doc_id", "text", "y",
      nBuckets = 1L << 30)
    val m = LrIngest.retrain(spark, db, t)
    def bScores(mm: QualityClassifier.LogisticModel) =
      QualityClassifier.scoreLogistic(scoreDocs, mm, "doc_id", "text",
          nBuckets = 1L << 30)
        .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert((m.biasE6, bScores(m)) === ((direct.biasE6, bScores(direct))))
    graft.ops.CacheScope.release(spark)
  }
}
