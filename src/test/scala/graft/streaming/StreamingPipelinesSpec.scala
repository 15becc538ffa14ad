package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(user_id: Long, event_type: String, value: Double, ts: Timestamp)

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
