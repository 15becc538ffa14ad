package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming pipeline builders — the reference's source→transform→sink
  * jobs (SURVEY §3) re-expressed as Structured Streaming graphs.
  *
  * Sources and sinks are pluggable DataFrames so the same transform
  * runs against Kafka (`spark.readStream.format("kafka")`) in
  * production and `MemoryStream` / file sources in tests. No cluster
  * service is required to exercise the logic.
  */
object StreamingPipelines {

  /** S1/S2 — Kafka JSON source: subscribe + parse + watermark. The
    * standard shape for every reference pipeline's head
    * (rt-flink KafkaUtil.scala:18-23,41-56).
    */
  def kafkaJsonSource(spark: SparkSession, bootstrap: String, topic: String,
                      groupId: String, schema: org.apache.spark.sql.types.StructType,
                      watermark: Option[(String, String)] = None): DataFrame = {
    val raw = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("kafka.group.id", groupId)
      .option("startingOffsets", "earliest")
      .load()
      .selectExpr("CAST(value AS STRING) AS json")
      .select(from_json(col("json"), schema).as("r"))
      .select(col("r.*"))
    watermark.fold(raw) { case (c, delay) => raw.withWatermark(c, delay) }
  }

  /** A1/A4 — tumbling-window stats over a watermarked stream
    * (ref: VisitorStatsApp.scala:167-200). Append-mode safe: only
    * watermark-closed windows emit.
    */
  def windowedStats(events: DataFrame, keys: Seq[String], windowLen: String,
                    tsCol: String = "ts", delay: String = "10 seconds"): DataFrame = {
    val w = window(col(tsCol), windowLen)
    events.withWatermark(tsCol, delay)
      .groupBy(w.as("w") +: keys.map(col): _*)
      .agg(count(lit(1)).as("pv_ct"),
        approx_count_distinct(col("user_id")).as("uv_ct"),
        sum(col("value")).as("dur_sum"))
      .select(
        (date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt") +:
          date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("edt") +:
          keys.map(col)) :+ col("pv_ct") :+ col("uv_ct") :+ col("dur_sum"): _*)
  }

  /** K2 — dynamic-topic Kafka sink: the built-in Kafka sink honors a
    * per-row `topic` column (ref dynamic serializer
    * OdsBaseDbApp.scala:106-119 → one select).
    */
  def toDynamicKafkaShape(routed: DataFrame, topicCol: String): DataFrame =
    routed.select(col(topicCol).as("topic"),
      to_json(struct(routed.columns.filterNot(_ == topicCol).map(col): _*)).as("value"))

  /** O2 — config-driven fan-out inside foreachBatch: one persisted batch,
    * N filtered writes (ref: OdsBaseDbApp.scala:92-119). `write` receives
    * (sinkTable, slice) per routing target.
    */
  def configRoutedForeachBatch(
      config: Map[String, (String, String)], // source_type -> (sink_type, sink_table)
      write: (String, String, DataFrame) => Unit): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => {
      val persisted = batch.persist()
      try {
        config.foreach { case (srcType, (sinkType, sinkTable)) =>
          val slice = persisted.filter(col("event_type") === srcType)
          write(sinkType, sinkTable, slice)
        }
      } finally { persisted.unpersist(); () }
    }

  /** K3 — JDBC batch sink with transient-column drop
    * (ref: ClickHouseUtil.scala:21-53 `@TransientSink` reflection → an
    * explicit drop list; `foreachBatch` + `df.write.jdbc`).
    */
  def jdbcSink(url: String, table: String, transientCols: Seq[String],
               props: java.util.Properties): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      batch.drop(transientCols: _*).write.mode("append").jdbc(url, table, props)

  /** Start a memory-sink query for tests: append mode, processes all
    * available then returns the query for `processAllAvailable()`.
    */
  def startMemorySink(df: DataFrame, name: String,
                      mode: String = "append"): StreamingQuery =
    df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
}
