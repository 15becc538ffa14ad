package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ops.Privacy

/** The streaming frequency-threshold gate: hold-until-k-distinct-docs
  * with retroactive release, batch-equivalent across any micro-batch
  * slicing, conservative under the buffer cap.
  */
class ReleaseGateSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  implicit lazy val sp: org.apache.spark.sql.SparkSession = spark
  import spark.implicits._
  import ReleaseGate.KeyedRow

  private def run(batches: Seq[Seq[KeyedRow]], minDocs: Int,
                  maxBuffered: Int = 100000): Seq[Seq[KeyedRow]] = {
    val input = MemoryStream[KeyedRow]
    val emitted = scala.collection.mutable.ArrayBuffer[Seq[KeyedRow]]()
    val gated = ReleaseGate.frequencyThresholdStream(
      input.toDS(), minDocs, maxBuffered)
    val q = gated.writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[KeyedRow], _: Long) =>
        val rows = df.collect().toSeq
        if (rows.nonEmpty) emitted += rows
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rgck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    emitted.toSeq
  }

  test("rows hold until k distinct docs, then release retroactively in arrival order") {
    val out = run(Seq(
      Seq(KeyedRow("a", 1), KeyedRow("a", 1)),   // 1 distinct doc — held
      Seq(KeyedRow("a", 2)),                     // 2 — still held
      Seq(KeyedRow("a", 3), KeyedRow("b", 9))),  // a crosses; b held
      minDocs = 3)
    assert(out.flatten === Seq(KeyedRow("a", 1), KeyedRow("a", 1),
      KeyedRow("a", 2), KeyedRow("a", 3)))
    // nothing emitted before the crossing batch
    assert(out.size === 1)
  }

  test("after release, later rows flow through; repeats of old docs count once") {
    val out = run(Seq(
      Seq(KeyedRow("a", 1), KeyedRow("a", 2)),
      Seq(KeyedRow("a", 1)),                     // repeat doc — still 2 distinct
      Seq(KeyedRow("a", 3)),                     // crosses
      Seq(KeyedRow("a", 99))),                   // flows immediately
      minDocs = 3)
    assert(out.flatten.map(_.doc) === Seq(1L, 2L, 1L, 3L, 99L))
  }

  test("emitted set equals the batch operator, regardless of slicing") {
    val rows = (0 until 60).map { i =>
      KeyedRow(s"k${i % 7}", (i % 13).toLong)
    }
    // slice the same rows three different ways
    val slicings = Seq(Seq(rows), rows.grouped(7).toSeq, rows.map(Seq(_)))
    val batchKept = Privacy.frequencyThreshold(
        rows.toDF("key", "doc"), "key", "doc", minDocs = 5L)
      .as[KeyedRow].collect().toSeq.sortBy(r => (r.key, r.doc))
    for (slicing <- slicings) {
      val streamed = run(slicing, minDocs = 5)
        .flatten.sortBy(r => (r.key, r.doc))
      assert(streamed === batchKept, s"slicing into ${slicing.size} batches")
    }
  }

  test("buffer cap drops conservatively: capped rows never release") {
    val out = run(Seq(
      Seq(KeyedRow("a", 1), KeyedRow("a", 1), KeyedRow("a", 1)), // 2 buffered + 1 dropped
      Seq(KeyedRow("a", 2))),                                    // crosses at minDocs=2
      minDocs = 2, maxBuffered = 2)
    // the third doc-1 row was beyond the cap — under-release, never false release
    assert(out.flatten === Seq(KeyedRow("a", 1), KeyedRow("a", 1),
      KeyedRow("a", 2)))
  }

  // ————— streaming k-anonymity suppression —————

  import ReleaseGate.CellRow
  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
  private val closeAt = ts(100)
  // the watermark only closes cohorts when a LATER event advances it
  // past closeAt — the sentinel plays the role of the next release
  // window's traffic
  private val sentinel = CellRow("~wm", ts(1000), -1L)

  private def runCells(batches: Seq[Seq[CellRow]], k: Int)
      : Seq[CellRow] = {
    val input = MemoryStream[CellRow]
    val emitted = scala.collection.mutable.ArrayBuffer[CellRow]()
    val gated = ReleaseGate.suppressSmallCellsStream(input.toDS(), k, closeAt)
    val q = gated.writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[CellRow], _: Long) =>
        emitted ++= df.collect(); ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("kack").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // advance the watermark past closeAt, then run one more trigger so
      // the event-time timeouts fire
      input.addData(sentinel); q.processAllAvailable()
      input.addData(sentinel.copy(id = -2L)); q.processAllAvailable()
    } finally q.stop()
    // sentinels filter by id: at close they re-emit with cell = "*"
    emitted.filter(_.id >= 0).toSeq
  }

  test("k-anonymity stream: emitted set equals the batch operator for any slicing") {
    val rows = (0 until 40).map { i =>
      // cohort sizes 1..8-ish: cells c0..c5 with skewed membership
      CellRow(s"c${i % 6}", ts(10 + i), i.toLong)
    } ++ Seq(CellRow("lone", ts(50), 99L)) // a 1-row cohort: must suppress
    val batch = Privacy.suppressSmallCells(
        rows.toDF("cell", "ts", "id"), Seq("cell"), k = 7L)
      .select("cell", "id").as[(String, Long)].collect().toSeq.sorted
    val slicings = Seq(Seq(rows), rows.grouped(6).toSeq, rows.map(Seq(_)))
    for (slicing <- slicings) {
      val streamed = runCells(slicing, k = 7)
        .map(r => (r.cell, r.id)).sorted
      assert(streamed === batch, s"slicing into ${slicing.size} batches")
    }
  }

  test("k-anonymity stream: retroactive release in arrival order, then flow-through") {
    val out = runCells(Seq(
      Seq(CellRow("a", ts(10), 1), CellRow("a", ts(11), 2)), // held
      Seq(CellRow("b", ts(12), 7)),                          // held
      Seq(CellRow("a", ts(13), 3)),                          // a reaches k=3
      Seq(CellRow("a", ts(14), 4))),                         // flows
      k = 3)
    // a's rows release unsuppressed (retroactively, arrival order);
    // b's single row suppresses at watermark close, AFTER a's flow
    assert(out.map(_.id) === Seq(1L, 2L, 3L, 4L, 7L))
    assert(out.filter(_.id == 7L).head.cell === "*")
    assert(out.filter(_.id <= 4L).forall(_.cell === "a"))
  }

  // ————— streaming l-diversity suppression —————

  import ReleaseGate.SensRow

  private def runSens(batches: Seq[Seq[SensRow]], l: Int): Seq[SensRow] = {
    val input = MemoryStream[SensRow]
    val emitted = scala.collection.mutable.ArrayBuffer[SensRow]()
    val gated = ReleaseGate.suppressLowDiversityStream(input.toDS(), l, closeAt)
    val q = gated.writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[SensRow], _: Long) =>
        emitted ++= df.collect(); ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ldck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData(SensRow("~wm", "~", ts(1000), -1L)); q.processAllAvailable()
      input.addData(SensRow("~wm", "~", ts(1000), -2L)); q.processAllAvailable()
    } finally q.stop()
    emitted.filter(_.id >= 0).toSeq
  }

  test("l-diversity stream: emitted set equals the batch operator for any slicing") {
    // cohorts with controlled diversity: cell cN has sensitive values
    // drawn from a pool of size (N+1) — at l=3, c0 (1 value) and c1
    // (2 values) suppress, c2..c4 release
    val rows = (0 until 45).map { i =>
      val c = i % 5
      SensRow(s"c$c", s"s${i % (c + 1)}", ts(10 + i), i.toLong)
    }
    val batch = Privacy.suppressLowDiversity(
        rows.toDF("cell", "sens", "ts", "id"), Seq("cell"), "sens", l = 3L)
      .select("cell", "id").as[(String, Long)].collect().toSeq.sorted
    val slicings = Seq(Seq(rows), rows.grouped(6).toSeq, rows.map(Seq(_)))
    for (slicing <- slicings) {
      val streamed = runSens(slicing, l = 3)
        .map(r => (r.cell, r.id)).sorted
      assert(streamed === batch, s"slicing into ${slicing.size} batches")
    }
  }

  test("l-diversity stream: repeats of one sensitive value never release") {
    val out = runSens(Seq(
      // cohort "u": many rows, ONE sensitive value — must hold to
      // close and publish suppressed (the uniform cohort the gate
      // exists for; a row-count gate would have released it)
      Seq(SensRow("u", "m", ts(10), 1), SensRow("u", "m", ts(11), 2)),
      Seq(SensRow("u", "m", ts(12), 3), SensRow("u", "m", ts(13), 4)),
      // cohort "d": 2 distinct at l=2 — releases retroactively on the
      // second VALUE (id 6), in arrival order
      Seq(SensRow("d", "x", ts(14), 5)),
      Seq(SensRow("d", "y", ts(15), 6), SensRow("d", "x", ts(16), 7))),
      l = 2)
    assert(out.map(_.id) === Seq(5L, 6L, 7L, 1L, 2L, 3L, 4L))
    assert(out.filter(_.cell == "d").map(_.id) === Seq(5L, 6L, 7L))
    assert(out.filter(_.cell == "*").map(_.id) === Seq(1L, 2L, 3L, 4L),
      s"the uniform cohort must publish pooled: $out")
  }

  test("l-diversity stream: NULL sensitive never counts toward diversity (no false release)") {
    // cohort "n": two null-sens rows plus ONE real value at l=2 — a
    // null that counted as distinct would release the cohort RAW (the
    // r17 review catch, and the one failure direction the gate
    // promises never to take); the batch operator filters isNotNull,
    // so the cohort must hold to close and publish suppressed
    val out = runSens(Seq(
      Seq(SensRow("n", null, ts(10), 1), SensRow("n", "flu", ts(11), 2)),
      Seq(SensRow("n", null, ts(12), 3)),
      // cohort "d" releases normally alongside (2 real values)
      Seq(SensRow("d", "x", ts(13), 4), SensRow("d", "y", ts(14), 5))),
      l = 2)
    assert(out.filter(_.cell == "*").map(_.id).sorted === Seq(1L, 2L, 3L),
      s"the null-padded cohort must publish pooled, never raw: $out")
    assert(out.filter(_.cell == "d").map(_.id).sorted === Seq(4L, 5L))
    // batch agreement on the same rows
    val batch = Privacy.suppressLowDiversity(
        Seq(("n", null, ts(10), 1L), ("n", "flu", ts(11), 2L),
          ("n", null, ts(12), 3L), ("d", "x", ts(13), 4L),
          ("d", "y", ts(14), 5L)).toDF("cell", "sens", "ts", "id"),
        Seq("cell"), "sens", l = 2L)
      .select("cell", "id").as[(String, Long)].collect().toSeq
    assert(batch.filter(_._1 == "*").map(_._2).sorted === Seq(1L, 2L, 3L))
  }

  test("k-anonymity stream: late rows of a published-suppressed cohort fail closed") {
    val input = MemoryStream[CellRow]
    val emitted = scala.collection.mutable.ArrayBuffer[CellRow]()
    val gated = ReleaseGate.suppressSmallCellsStream(input.toDS(), 3, closeAt)
    val q = gated.writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[CellRow], _: Long) =>
        emitted ++= df.collect(); ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("kalate").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(CellRow("x", ts(10), 1)); q.processAllAvailable()
      input.addData(sentinel); q.processAllAvailable()
      input.addData(sentinel.copy(id = -2L)); q.processAllAvailable()
      // x was published suppressed; a flood of x rows arrives after
      // the close (at/above the watermark, so the late-data filter
      // passes them through — rows BELOW the watermark are dropped by
      // Spark outright, which is also conservative). They must ALL
      // emit suppressed: the marker is already public, releasing them
      // raw would single the cohort out after the fact
      input.addData(CellRow("x", ts(1500), 2), CellRow("x", ts(1500), 3),
        CellRow("x", ts(1500), 4))
      q.processAllAvailable()
    } finally q.stop()
    val xs = emitted.filter(_.id >= 0)
    assert(xs.map(_.id).sorted === Seq(1L, 2L, 3L, 4L))
    assert(xs.forall(_.cell === "*"),
      s"late rows must stay suppressed: $xs")
  }

  test("keyFingerprint replays the batch gate's xxhash64 lanes exactly") {
    // the scaladoc claims exact arithmetic parity with
    // Privacy.frequencyThreshold's exchanges — pin it: both lanes must
    // equal the SQL expressions for representative keys (ASCII, CJK,
    // emoji/surrogates, empty)
    for (key <- Seq("abc", "the quick brown fox", "中文键", "e😀j", "")) {
      val (h1, h2) = ReleaseGate.keyFingerprint(key)
      val row = Seq(key).toDF("k")
        .select(org.apache.spark.sql.functions.xxhash64($"k"),
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.lit("graft.fq.salt"), $"k"))
        .head()
      assert((h1, h2) === ((row.getLong(0), row.getLong(1))),
        s"fingerprint lanes diverge from SQL xxhash64 for '$key'")
    }
  }

  test("frequency gate state is fingerprint-keyed: released KB-keys leave no text in state") {
    // 50 keys of ~20 KB each, all released within their arrival batch
    // (two distinct docs per key). Raw-text state keying would hold
    // ≥ 1 MB of key text in the store FOREVER (the key rows outlive
    // release); the fingerprint posture keeps 16 bytes per key + an
    // O(1) value. The bound discriminates: fingerprints measure in the
    // tens of KB, raw text in the MBs.
    val bigKeys = (0 until 50).map(i => s"k$i-" + ("x" * 20000))
    val input = MemoryStream[KeyedRow]
    val emitted = scala.collection.mutable.ArrayBuffer[KeyedRow]()
    val q = ReleaseGate.frequencyThresholdStream(input.toDS(), minDocs = 2)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[KeyedRow], _: Long) =>
        emitted ++= df.collect(); ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rgfp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(bigKeys.flatMap(k => Seq(KeyedRow(k, 1), KeyedRow(k, 2))): _*)
      q.processAllAvailable()
      // a follow-up row per key must still flow (the released flag is
      // found under the fingerprint key)
      input.addData(bigKeys.map(k => KeyedRow(k, 9)): _*)
      q.processAllAvailable()
      assert(emitted.size === 150, "2 released retroactively + 1 flowed per key")
      assert(emitted.map(_.key).distinct.sorted === bigKeys.sorted)
      val mem = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.memoryUsedBytes).getOrElse(Long.MaxValue)
      assert(mem < 512 * 1024L,
        s"state must hold fingerprints, not key text: $mem bytes")
    } finally q.stop()
  }

  test("buffer-cap drops are surfaced through the counter (frequency + l-gate)") {
    // frequency gate: 3 same-doc rows at cap 2 — one drop, counted
    val fqDrops = spark.sparkContext.longAccumulator("t.fq.drop")
    val fin = MemoryStream[KeyedRow]
    val fq = ReleaseGate.frequencyThresholdStream(fin.toDS(), minDocs = 2,
        maxBuffered = 2, droppedCounter = Some(fqDrops))
      .writeStream.format("memory").queryName("fq_drop_t")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rgdc").toString)
      .start()
    try {
      fin.addData(KeyedRow("a", 1), KeyedRow("a", 1), KeyedRow("a", 1))
      fq.processAllAvailable()
      fin.addData(KeyedRow("a", 2)); fq.processAllAvailable()
    } finally fq.stop()
    assert(fqDrops.value === 1L, s"one row dropped at the cap: ${fqDrops.value}")
    assert(spark.table("fq_drop_t").count() === 3L)

    // l-gate: uniform 4-row cohort at cap 2 — two drops counted; only
    // the 2 buffered rows publish suppressed at close
    val lDrops = spark.sparkContext.longAccumulator("t.ld.drop")
    val lin = MemoryStream[SensRow]
    val emitted = scala.collection.mutable.ArrayBuffer[SensRow]()
    val lq = ReleaseGate.suppressLowDiversityStream(lin.toDS(), l = 2,
        closeAt, maxBuffered = 2, droppedCounter = Some(lDrops))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[SensRow], _: Long) =>
        emitted ++= df.collect(); ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rgdl").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      lin.addData((1 to 4).map(i => SensRow("u", "m", ts(10 + i), i.toLong)): _*)
      lq.processAllAvailable()
      lin.addData(SensRow("~wm", "~", ts(1000), -1L)); lq.processAllAvailable()
      lin.addData(SensRow("~wm", "~", ts(1000), -2L)); lq.processAllAvailable()
    } finally lq.stop()
    assert(lDrops.value === 2L, s"two rows dropped at the cap: ${lDrops.value}")
    val us = emitted.filter(_.id >= 0)
    assert(us.map(_.id).sorted === Seq(1L, 2L) && us.forall(_.cell === "*"),
      s"only buffered rows publish, suppressed: $us")
  }
}
