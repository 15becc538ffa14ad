package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Scd

/** Streaming SCD2 ingest: the standing history after N micro-batches
  * must equal ONE batch `buildHistory` over every accepted row (batch
  * boundaries invisible — the q148-style incremental ≡ full property,
  * on dimensions), with retro-edits quarantined, not spliced.
  */
class ScdIngestSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val db = "graft_scding_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    super.afterAll()
  }

  test("incremental micro-batches equal the batch rebuild; retro-edits quarantine") {
    val rejects = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val sink = ScdIngest.scd2Sink(spark, db, "dim_hist",
      "k", "ts", "tie", Seq("city", "tier")) {
      (bid, nRej) => rejects += ((bid, nRej)); ()
    }
    val input = MemoryStream[(Long, Long, Long, String, String)]
    val q = input.toDF().toDF("k", "ts", "tie", "city", "tier").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("scdck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    // (k, ts, tie, city, tier) — batch 2 includes an unchanged-attr
    // version for k=1 (must COLLAPSE into the open run, not split it)
    // and a brand-new key; batch 3 includes a retro-edit for k=2
    // (ts=15 ≤ its current effective_from 20 — rejected) plus real
    // updates. Same-ts rows for k=3 in batch 2 order by tie.
    val b1 = Seq((1L, 10L, 0L, "ham", "a"), (2L, 20L, 0L, "nyc", "a"))
    val b2 = Seq((1L, 30L, 0L, "ham", "a"), (3L, 30L, 1L, "ber", "b"),
      (3L, 30L, 2L, "ber", "c"))
    val b3 = Seq((2L, 15L, 0L, "sfo", "x"), (1L, 40L, 0L, "muc", "b"),
      (2L, 35L, 0L, "nyc", "b"))
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()

    assert(rejects.map(_._2).sum === 1L,
      s"exactly the retro-edit must quarantine: $rejects")
    val quarantined = spark.table(s"`$db`.`dim_hist_rejects`")
      .select("k", "ts", "tie", "city", "tier")
      .as[(Long, Long, Long, String, String)].collect().toSeq
    assert(quarantined === Seq((2L, 15L, 0L, "sfo", "x")))
    // provenance: the reject row records which batch produced it
    assert(spark.table(s"`$db`.`dim_hist_rejects`")
      .select("__batch_id").as[Long].collect().toSeq === Seq(2L))

    // accepted rows = everything except the retro-edit
    val accepted = (b1 ++ b2 ++ b3).filterNot(_ == (2L, 15L, 0L, "sfo", "x"))
      .toDF("k", "ts", "tie", "city", "tier")
    val expected = Scd.buildHistory(accepted, "k", "ts", "tie",
      Seq("city", "tier"))
    val standing = spark.table(s"`$db`.`dim_hist`")
    assert(standing.count() === expected.count())
    assert(standing.exceptAll(expected).isEmpty &&
      expected.exceptAll(standing).isEmpty,
      s"standing:\n${standing.orderBy("k", "effective_from").collect().mkString("\n")}\n" +
        s"expected:\n${expected.orderBy("k", "effective_from").collect().mkString("\n")}")

    // the q136 point-in-time read over the streamed history
    val at35 = Scd.snapshotAt(standing, lit(35L))
      .select($"k", $"city", $"tier").as[(Long, String, String)]
      .collect().toSet
    assert(at35 === Set((1L, "ham", "a"), (2L, "nyc", "b"), (3L, "ber", "c")))

    // REPLAY: Structured Streaming re-runs the last batchId after a
    // failure between the sink and the checkpoint commit. Re-invoking
    // the sink with b3 (batchId 2) against the already-updated state
    // must leave BOTH tables byte-identical: no duplicate quarantine
    // entry for the genuine retro-edit (guard 2), and no false
    // retro-edits from already-applied version boundaries (guard 1 —
    // without it, (1,40,muc,b) and (2,35,nyc,b) now have ts ≤ their
    // keys' current effective_from and would re-classify as rejects).
    val histBefore = standing.collect().toSet
    val rejBefore = spark.table(s"`$db`.`dim_hist_rejects`").collect().toSet
    sink(b3.toDF("k", "ts", "tie", "city", "tier"), 2L)
    assert(spark.table(s"`$db`.`dim_hist`").collect().toSet === histBefore,
      "replay must leave the history unchanged")
    assert(spark.table(s"`$db`.`dim_hist_rejects`").collect().toSet
        === rejBefore,
      "replay must not duplicate or invent quarantine entries")
  }

  test("replay of a batch whose rejects were never recorded adds no false entries") {
    // the nastier replay window: failure AFTER the history overwrite,
    // BEFORE checkpoint commit, on a batch with ZERO genuine rejects —
    // batchId-presence alone cannot guard (nothing was appended), so
    // guard 1's exact-version anti join must absorb every re-classified
    // boundary row by itself
    val db2 = "graft_scding_replay"
    spark.sql(s"DROP DATABASE IF EXISTS `$db2` CASCADE")
    val alerts = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val sink = ScdIngest.scd2Sink(spark, db2, "h",
      "k", "ts", "tie", Seq("v")) { (b, n) => alerts += ((b, n)); () }
    val b0 = Seq((1L, 10L, 0L, "a"), (1L, 20L, 0L, "b"), (2L, 10L, 0L, "x"))
      .toDF("k", "ts", "tie", "v")
    sink(b0, 0L)
    assert(alerts === Seq((0L, 0L)), s"clean batch must not alert: $alerts")
    val histBefore = spark.table(s"`$db2`.`h`").collect().toSet
    // replay the same batch against the updated history: every version
    // boundary re-classifies as ts <= effective_from — all must suppress
    sink(b0, 0L)
    assert(!spark.catalog.tableExists(s"$db2.h_rejects"),
      "replay of a clean batch must not create a quarantine table")
    assert(alerts === Seq((0L, 0L), (0L, 0L)),
      s"replay must not raise a spurious non-zero alert: $alerts")
    assert(spark.table(s"`$db2`.`h`").collect().toSet === histBefore)
    spark.sql(s"DROP DATABASE IF EXISTS `$db2` CASCADE")
  }

  test("replay absorbs mid-batch COLLAPSED rows (covering-interval guard)") {
    // (k,t1,A),(k,t2,A),(k,t3,B): the first apply collapses t2 (same
    // attrs as the open run), so t2 is not any version's boundary. A
    // replay re-classifies it as ts <= the new effective_from, and the
    // old exact-(ts = effective_from) guard re-appended it to the
    // quarantine on EVERY replay — the r17 review catch. The
    // covering-interval guard absorbs it: t2 sits inside [t1, t3) with
    // matching attrs, a no-op by the collapse rule itself.
    val db4 = "graft_scding_collapse"
    spark.sql(s"DROP DATABASE IF EXISTS `$db4` CASCADE")
    val alerts = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val sink = ScdIngest.scd2Sink(spark, db4, "h",
      "k", "ts", "tie", Seq("v")) { (b, n) => alerts += ((b, n)); () }
    val b0 = Seq((1L, 10L, 0L, "A"), (1L, 20L, 0L, "A"), (1L, 30L, 0L, "B"))
      .toDF("k", "ts", "tie", "v")
    sink(b0, 0L)
    assert(alerts === Seq((0L, 0L)), s"clean batch must not alert: $alerts")
    val histBefore = spark.table(s"`$db4`.`h`").collect().toSet
    sink(b0, 0L) // the window-A replay, collapsed row included
    assert(!spark.catalog.tableExists(s"$db4.h_rejects"),
      "the collapsed row is a redelivery, not a retro-edit — no quarantine")
    assert(alerts === Seq((0L, 0L), (0L, 0L)),
      s"replay must not raise a spurious alert for the collapsed row: $alerts")
    assert(spark.table(s"`$db4`.`h`").collect().toSet === histBefore)
    // a GENUINE retro-edit inside a covered window but with DIFFERENT
    // attrs still quarantines — absorption is attr-conditional
    sink(Seq((1L, 15L, 0L, "Z")).toDF("k", "ts", "tie", "v"), 1L)
    assert(alerts.last === ((1L, 1L)),
      s"a covered-ts row with different attrs is a real retro-edit: $alerts")
    spark.sql(s"DROP DATABASE IF EXISTS `$db4` CASCADE")
  }

  test("replay with NULL attributes: guard 1's anti join must be null-safe") {
    // a recorded version carrying a NULL attribute is redelivered on
    // replay — null-UNSAFE equality never matches it against its
    // recorded twin, so every replay would re-append it to the
    // quarantine (duplicate rejects + false non-zero alerts)
    val db3 = "graft_scding_nullattr"
    spark.sql(s"DROP DATABASE IF EXISTS `$db3` CASCADE")
    val alerts = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val sink = ScdIngest.scd2Sink(spark, db3, "h",
      "k", "ts", "tie", Seq("v")) { (b, n) => alerts += ((b, n)); () }
    val b0 = Seq((1L, 10L, 0L, Some("a")), (1L, 20L, 0L, None: Option[String]))
      .toDF("k", "ts", "tie", "v")
    sink(b0, 0L)
    assert(alerts === Seq((0L, 0L)))
    val histBefore = spark.table(s"`$db3`.`h`").collect().toSet
    sink(b0, 0L) // replay: the NULL-attr boundary row must anti-join away
    assert(!spark.catalog.tableExists(s"$db3.h_rejects"),
      "NULL-attr redelivery must not quarantine on replay")
    assert(alerts === Seq((0L, 0L), (0L, 0L)),
      s"replay must not raise a spurious alert for NULL-attr rows: $alerts")
    assert(spark.table(s"`$db3`.`h`").collect().toSet === histBefore)
    spark.sql(s"DROP DATABASE IF EXISTS `$db3` CASCADE")
  }
}
