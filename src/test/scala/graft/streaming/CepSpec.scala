package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** General CEP sequence patterns (r11 verdict "what's missing" #3):
  * N-step begin→next→…→within over keyed streams, with completion
  * output and the timeout side output, in both contiguity modes —
  * driven through MemoryStream → flatMapGroupsWithState → memory sink
  * (the real incremental path, as in StatefulOpsSpec).
  */
class CepSpec extends SparkSpec {
  implicit lazy val s2: org.apache.spark.sql.SparkSession = spark
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private def run3Step(strict: Boolean, name: String,
                       batches: Seq[Seq[PageEvent]]): Set[(String, Int, Boolean, Seq[Long])] = {
    val input = MemoryStream[PageEvent]
    val events = input.toDS().withWatermark("ts", "0 seconds")
    // the classic funnel: land on home -> view a product -> pay
    val out = Cep.sequencePattern[PageEvent](events, _.mid, _.ts,
      steps = Seq(_.pageId == "home", _.pageId == "product", _.pageId == "pay"),
      withinSeconds = 60, strict = strict)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // advance the watermark far forward so pending windows expire
      input.addData(PageEvent("zzz", "home", None, "0", ts(900000)))
      q.processAllAvailable()
      input.addData(PageEvent("zzz", "pay", None, "0", ts(999999)))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[PatternMatch[PageEvent]].collect()
      .filterNot(_.key == "zzz")
      .map(m => (m.key, m.step, m.completed, m.events.map(_.ts.getTime / 1000)))
      .toSet
  }

  test("3-step pattern completes in order within the window") {
    val got = run3Step(strict = true, "cep_complete", Seq(Seq(
      PageEvent("u1", "home", None, "0", ts(10)),
      PageEvent("u1", "product", None, "0", ts(20)),
      PageEvent("u1", "pay", None, "0", ts(30)))))
    assert(got == Set(("u1", 3, true, Seq(10L, 20L, 30L))))
  }

  test("window expiry emits the partial on the timeout side output (watermark-driven)") {
    val got = run3Step(strict = true, "cep_timeout", Seq(Seq(
      PageEvent("u1", "home", None, "0", ts(10)),
      PageEvent("u1", "product", None, "0", ts(20)))))
    // 2 of 3 steps matched; the watermark expired the window
    assert(got == Set(("u1", 2, false, Seq(10L, 20L))))
  }

  test("a too-late step is not a completion: expiry fires, the late event can restart") {
    val got = run3Step(strict = true, "cep_late_step", Seq(
      Seq(PageEvent("u1", "home", None, "0", ts(10)),
        PageEvent("u1", "product", None, "0", ts(20))),
      // pay arrives at t=100 — beyond 10+60: the attempt expired
      Seq(PageEvent("u1", "pay", None, "0", ts(100)))))
    assert(got == Set(("u1", 2, false, Seq(10L, 20L))))
  }

  test("strict `next`: a contiguity miss discards the attempt; the miss can restart") {
    val got = run3Step(strict = true, "cep_strict", Seq(Seq(
      PageEvent("u1", "home", None, "0", ts(10)),
      PageEvent("u1", "search", None, "0", ts(15)), // not `product`: kills it
      PageEvent("u1", "product", None, "0", ts(20)),
      PageEvent("u1", "pay", None, "0", ts(30)),
      // a second key completes cleanly THROUGH an interleaved restart
      PageEvent("u2", "home", None, "0", ts(10)),
      PageEvent("u2", "home", None, "0", ts(12)), // home restarts: still step 1
      PageEvent("u2", "product", None, "0", ts(20)),
      PageEvent("u2", "pay", None, "0", ts(25)))))
    // u1: after the kill nothing re-begins (product is not `home`) and
    // pay alone matches nothing — no output at all for u1
    assert(got == Set(("u2", 3, true, Seq(12L, 20L, 25L))))
  }

  test("relaxed `followedBy`: interleaved non-matching events are ignored") {
    val got = run3Step(strict = false, "cep_relaxed", Seq(Seq(
      PageEvent("u1", "home", None, "0", ts(10)),
      PageEvent("u1", "search", None, "0", ts(15)), // ignored
      PageEvent("u1", "product", None, "0", ts(20)),
      PageEvent("u1", "cart", None, "0", ts(25)),   // ignored
      PageEvent("u1", "pay", None, "0", ts(30)))))
    assert(got == Set(("u1", 3, true, Seq(10L, 20L, 30L))))
  }

  test("reproduces ST3: [entry, any-page] within 10s — timeout output == bounceDetect on the reference fixture") {
    // the reference's inline fixture (UserJumpDetailApp.scala:74-78),
    // already pinned for bounceDetect: mids 101/103 bounce; 102's
    // second entry bounces, its first does not (3s follow-up)
    val fixture = Seq(
      PageEvent("101", "home", None, "1", ts(10)),
      PageEvent("102", "home", None, "1", ts(20)),
      PageEvent("102", "good_list", Some("home"), "1", ts(23)),
      PageEvent("102", "home", None, "1", ts(38)),
      PageEvent("103", "detail", Some(""), "1", ts(30)))

    val input = MemoryStream[PageEvent]
    val events = input.toDS().withWatermark("ts", "0 seconds")
    val pattern = Cep.sequencePattern[PageEvent](events, _.mid, _.ts,
      steps = Seq(e => e.lastPageId.forall(_.isEmpty), _ => true),
      withinSeconds = 10, strict = true)
    val q = pattern.writeStream.format("memory").queryName("cep_bounce")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(fixture: _*)
      q.processAllAvailable()
      input.addData(PageEvent("zzz", "x", Some("p"), "0", ts(100000)))
      q.processAllAvailable()
      input.addData(PageEvent("zzz", "y", Some("p"), "0", ts(400000)))
      q.processAllAvailable()
    } finally q.stop()

    val bounces = spark.table("cep_bounce").as[PatternMatch[PageEvent]].collect()
      .filter(m => !m.completed && m.key != "zzz")
      .map(m => (m.key, m.events.head.ts.getTime / 1000)).toSet
    assert(bounces == Set(("101", 10L), ("102", 38L), ("103", 30L)),
      s"the CEP timeout side output must be the bounce set: $bounces")
  }

  test("batch twin runs the same fold: matches, kills, and end-of-data partials") {
    val evs = Seq(
      // key a: home -> product -> pay completes
      PageEvent("a", "home", None, "0", ts(0)),
      PageEvent("a", "product", None, "0", ts(10)),
      PageEvent("a", "pay", None, "0", ts(20)),
      // key b: strict kill (other page between) then a fresh complete
      PageEvent("b", "home", None, "0", ts(0)),
      PageEvent("b", "search", None, "0", ts(5)),
      PageEvent("b", "home", None, "0", ts(10)),
      PageEvent("b", "product", None, "0", ts(15)),
      PageEvent("b", "pay", None, "0", ts(25)),
      // key c: attempt still open at end of data
      PageEvent("c", "home", None, "0", ts(0)),
      PageEvent("c", "product", None, "0", ts(10))
    ).toDS()
    def run(emitPartials: Boolean) =
      Cep.sequencePatternBatch[PageEvent](evs, _.mid, _.ts,
        steps = Seq(_.pageId == "home", _.pageId == "product", _.pageId == "pay"),
        withinSeconds = 60, strict = true, emitPartials = emitPartials)
        .collect()
        .map(m => (m.key, m.step, m.completed, m.events.map(_.ts.getTime / 1000)))
        .toSet
    assert(run(emitPartials = false) == Set(
      ("a", 3, true, Seq(0L, 10L, 20L)),
      ("b", 3, true, Seq(10L, 15L, 25L))), run(false).toString)
    // end-of-data plays the watermark: the open attempt emits as the
    // timeout side output, exactly what the stream would do
    assert(run(emitPartials = true) == Set(
      ("a", 3, true, Seq(0L, 10L, 20L)),
      ("b", 3, true, Seq(10L, 15L, 25L)),
      ("c", 2, false, Seq(0L, 10L))), run(true).toString)
  }
}
