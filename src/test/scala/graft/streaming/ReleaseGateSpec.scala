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
}
