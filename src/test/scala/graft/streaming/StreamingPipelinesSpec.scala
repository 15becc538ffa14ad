package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(user_id: Long, event_type: String, value: Double, ts: Timestamp)
case class SOrder(id: Long, user_id: Long, event_ts: Timestamp)
case class SDetail(detail_id: Long, order_id: Long, amount: Double, event_ts: Timestamp)

class StreamingPipelinesSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("windowedStats: tumbling windows close under the watermark (append mode)") {
    val input = MemoryStream[Ev]
    val out = StreamingPipelines.windowedStats(
      input.toDF(), keys = Seq("event_type"), windowLen = "10 seconds",
      tsCol = "ts", delay = "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("ws")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
    input.addData(
      Ev(1, "view", 2.0, ts(1)), Ev(2, "view", 3.0, ts(4)),
      Ev(1, "click", 1.0, ts(12)))
    q.processAllAvailable()
    // watermark-advancing event closes the earlier windows
    input.addData(Ev(9, "view", 0.0, ts(100)))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ws")
      .select("stt", "event_type", "pv_ct").as[(String, String, Long)]
      .collect().toSet
    assert(rows.contains(("1970-01-01 00:00:00", "view", 2L)), s"got $rows")
    assert(rows.contains(("1970-01-01 00:00:10", "click", 1L)), s"got $rows")
  }

  test("dropDuplicatesWithinWatermark dedups keys with bounded state (ST2 built-in alternative)") {
    val input = MemoryStream[Ev]
    val out = input.toDF()
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("user_id")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("ddww")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
    input.addData(
      Ev(1, "view", 1.0, ts(1)),
      Ev(1, "click", 2.0, ts(3)),  // dup key within watermark window
      Ev(2, "view", 3.0, ts(5)))
    q.processAllAvailable(); q.stop()
    val users = spark.table("ddww").select("user_id").as[Long].collect().toSeq
    assert(users.sorted == Seq(1L, 2L), s"got $users")
  }

  test("stream-stream interval join (orderWide) matches only within the time bound") {
    val oi = MemoryStream[SOrder]
    val od = MemoryStream[SDetail]
    val users = Seq((100L, "alice"), (200L, "bob")).toDF("id", "user_name")
    val joined = graft.apps.Pipelines.orderWide(
      oi.toDF().withWatermark("event_ts", "5 seconds"),
      od.toDF().withWatermark("event_ts", "5 seconds"),
      Seq((users, "oi.user_id")), boundSeconds = 5)
      .select(col("detail_id"), col("user_name"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("owj")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
    def ts(sec: Long) = new Timestamp(sec * 1000)
    oi.addData(SOrder(1L, 100L, ts(10)), SOrder(2L, 200L, ts(10)))
    od.addData(
      SDetail(10L, 1L, 9.5, ts(12)),   // within ±5 s of order 1
      SDetail(11L, 2L, 3.0, ts(100)))  // 90 s after order 2 — outside
    q.processAllAvailable()
    // advance both watermarks past every bound
    oi.addData(SOrder(9L, 100L, ts(1000)))
    od.addData(SDetail(99L, 9L, 1.0, ts(2000)))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("owj").as[(Long, String)].collect().toSet
    assert(rows.contains((10L, "alice")), s"in-bound detail must join; got $rows")
    assert(!rows.exists(_._1 == 11L), s"out-of-bound detail must not join; got $rows")
  }

  test("file streaming source → windowed stats → parquet sink, resuming from checkpoint") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("fstream").toString
    new java.io.File(s"$dir/in").mkdirs()
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("ts", TimestampType)))
    def writeLines(name: String, lines: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(s"$dir/in/$name")
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes)
    }
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).json(s"$dir/in")
      val out = StreamingPipelines.windowedStats(
        stream, Seq("event_type"), "10 seconds", delay = "0 seconds")
      val q = out.writeStream.outputMode("append").format("parquet")
        .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    writeLines("f1.json", Seq(
      """{"user_id":1,"event_type":"view","value":2.0,"ts":"1970-01-01T00:00:01.000Z"}""",
      """{"user_id":2,"event_type":"view","value":3.0,"ts":"1970-01-01T00:00:04.000Z"}"""))
    runOnce() // watermark advances to 4 s; window [0,10) still open
    writeLines("f2.json", Seq(
      """{"user_id":3,"event_type":"click","value":1.0,"ts":"1970-01-01T00:01:00.000Z"}"""))
    runOnce() // resume from checkpoint: file2 closes the first window
    val out = spark.read.parquet(s"$dir/out")
      .select("stt", "event_type", "pv_ct")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out.contains(("1970-01-01 00:00:00", "view", 2L)), s"got $out")
  }

  test("toDynamicKafkaShape yields (topic, value-json) rows") {
    val df = Seq((1L, "signup", "dwd_signup")).toDF("id", "event_type", "sink_table")
    val shaped = StreamingPipelines.toDynamicKafkaShape(df, "sink_table")
    assert(shaped.columns.toSeq == Seq("topic", "value"))
    val (topic, value) = shaped.as[(String, String)].head()
    assert(topic == "dwd_signup")
    assert(value.contains("\"event_type\":\"signup\"") && value.contains("\"id\":1"))
  }

  test("configRoutedForeachBatch fans one batch out per routing rule") {
    val got = scala.collection.mutable.Map.empty[(String, String), Long]
    val fn = StreamingPipelines.configRoutedForeachBatch(
      Map("view" -> ("clickhouse", "dws_view"), "signup" -> ("kafka", "dwd_signup")),
      (sinkType, sinkTable, df) => got.synchronized {
        got((sinkType, sinkTable)) = df.count()
      })
    val batch = Seq(
      (1L, "view"), (2L, "view"), (3L, "signup"), (4L, "error")
    ).toDF("id", "event_type")
    fn(batch, 0L)
    assert(got.toMap == Map(
      ("clickhouse", "dws_view") -> 2L, ("kafka", "dwd_signup") -> 1L))
  }
}
