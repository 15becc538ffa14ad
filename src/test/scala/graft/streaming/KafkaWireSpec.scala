package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType, TimestampType}

/** Kafka WIRE-FORMAT round trips without a broker (r11 verdict ask #4):
  * each Kafka pipeline shape serializes through the exact binary
  * `key`/`value`/`topic` columns Spark's Kafka sink puts on the wire
  * ([[StreamingPipelines.toWireBytes]]), lands in a parquet "topic"
  * (bytes preserved verbatim — the broker stand-in), and is re-read
  * through the IDENTICAL `from_json` ingest path production uses
  * ([[StreamingPipelines.parseKafkaJson]], the same code
  * `kafkaJsonSource` wraps). This closes the serialization half of the
  * Kafka seam that is this library's code (ref rt-flink
  * KafkaUtil.scala:41-56); only the broker socket itself stays
  * environment-gated (COVERAGE.md §2.13).
  */
class KafkaWireSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val eventSchema = StructType(Seq(
    StructField("user_id", StringType),
    StructField("event_type", StringType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  test("S2/K1 wire round trip: JSON events -> binary value bytes -> parquet topic -> parseKafkaJson") {
    val events = Seq(
      ("u1", "page", "2024-01-01 09:00:01", 1.5),
      ("u2", "start", "2024-01-01 09:00:02", 0.0),
      ("u3", "显示", "2024-01-01 09:00:03", 2.25)) // non-ASCII survives UTF-8 wire bytes
      .toDF("user_id", "event_type", "ts_s", "value")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("ts_s")).as("ts"), col("value"))
    // producer side: the fixed-topic sink shape (value = JSON of the row)
    val producer = events.select(to_json(struct(events.columns.map(col): _*)).as("value"))
    val wire = StreamingPipelines.toWireBytes(producer)
    assert(wire.schema("value").dataType.typeName == "binary",
      "wire value must be the sink's binary payload, not a string")
    val topicDir = tmpDir("wire_s2")
    wire.write.mode("overwrite").parquet(topicDir)

    // consumer side: the production parse path over the re-read bytes
    val back = StreamingPipelines.parseKafkaJson(spark.read.parquet(topicDir), eventSchema)
      .select("user_id", "event_type", "ts", "value")
      .as[(String, String, java.sql.Timestamp, Double)].collect().toSet
    val orig = events.as[(String, String, java.sql.Timestamp, Double)].collect().toSet
    assert(back == orig, s"wire round trip lost rows:\n$back\nvs\n$orig")
  }

  test("S2 STREAMING wire round trip: file-backed readStream through the same parse path") {
    val events = Seq(("u1", "page", "2024-01-01 09:00:01", 1.0),
      ("u2", "page", "2024-01-01 09:10:00", 2.0))
      .toDF("user_id", "event_type", "ts_s", "value")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("ts_s")).as("ts"), col("value"))
    val topicDir = tmpDir("wire_stream")
    StreamingPipelines.toWireBytes(
        events.select(to_json(struct(events.columns.map(col): _*)).as("value")))
      .write.mode("overwrite").parquet(topicDir)

    val raw = spark.readStream
      .schema(StructType(Seq(StructField("key", org.apache.spark.sql.types.BinaryType),
        StructField("value", org.apache.spark.sql.types.BinaryType))))
      .parquet(topicDir)
    val parsed = StreamingPipelines.parseKafkaJson(raw, eventSchema,
      watermark = Some(("ts", "10 seconds")))
    val q = StreamingPipelines.startMemorySink(parsed, "wire_stream_sink")
    q.processAllAvailable(); q.stop()
    val got = spark.table("wire_stream_sink")
      .select("user_id", "value").as[(String, Double)].collect().toSet
    assert(got == Set(("u1", 1.0), ("u2", 2.0)))
  }

  test("K2 dynamic-topic wire round trip: per-row topic routes records, payload survives") {
    val routed = Seq(("ods_order", "o1", 10.0), ("ods_pay", "p1", 3.5),
      ("ods_order", "o2", 20.0))
      .toDF("sink_table", "id", "amount")
    val wire = StreamingPipelines.toWireBytes(
      StreamingPipelines.toDynamicKafkaShape(routed, "sink_table"))
    val topicDir = tmpDir("wire_k2")
    // the broker partitions by topic; the parquet stand-in does the same
    wire.write.mode("overwrite").partitionBy("topic").parquet(topicDir)

    val payloadSchema = StructType(Seq(
      StructField("id", StringType), StructField("amount", DoubleType)))
    val back = StreamingPipelines.parseKafkaJson(
        spark.read.parquet(topicDir).filter(col("topic") === "ods_order"), payloadSchema)
      .as[(String, Double)].collect().toSet
    assert(back == Set(("o1", 10.0), ("o2", 20.0)),
      s"ods_order topic must hold exactly its routed rows: $back")
    val pay = StreamingPipelines.parseKafkaJson(
        spark.read.parquet(topicDir).filter(col("topic") === "ods_pay"), payloadSchema)
      .as[(String, Double)].collect().toSet
    assert(pay == Set(("p1", 3.5)))
  }

  test("S3 upsert-kafka wire round trip: tombstone NULL value survives; state re-materializes from the wire") {
    val changelog = Seq(
      ("k1", "a", 1L, false), ("k2", "x", 2L, false),
      ("k1", "b", 3L, false), ("k2", null.asInstanceOf[String], 4L, true))
      .toDF("k", "v", "off", "del")
    // producer: keyed records, delete -> NULL-value tombstone; the off
    // column rides OUTSIDE the kafka payload (broker offset stand-in)
    val wire = StreamingPipelines.toWireBytes(
        StreamingPipelines.toUpsertKafkaShape(changelog.drop("off"),
          keyCols = Seq("k"), deleteCol = Some("del")))
      .withColumn("off", monotonically_increasing_id())
    val topicDir = tmpDir("wire_s3")
    wire.write.mode("overwrite").parquet(topicDir)

    val back = spark.read.parquet(topicDir)
    // tombstone: value NULL through binary cast + parquet, key intact
    val tomb = back.filter(col("value").isNull)
    assert(tomb.count() == 1L)
    assert(tomb.selectExpr("CAST(key AS STRING)").as[String].head()
      .contains("\"k\":\"k2\""))
    // non-tombstones parse back losslessly through the ingest path,
    // including explicitly-serialized null fields (value.fields-include=ALL)
    val valSchema = StructType(Seq(
      StructField("k", StringType), StructField("v", StringType),
      StructField("del", org.apache.spark.sql.types.BooleanType)))
    val rows = StreamingPipelines.parseKafkaJson(back.filter(col("value").isNotNull), valSchema)
      .select("k", "v").as[(String, String)].collect().toSet
    assert(rows == Set(("k1", "a"), ("k1", "b"), ("k2", "x")))

    // consumer: LWW-materialize CURRENT STATE from the wire records —
    // key json + tombstone flag reconstructed exactly as a compacted-
    // topic reader would see them
    val keySchema = StructType(Seq(StructField("k", StringType)))
    val replay = back
      .select(from_json(expr("CAST(key AS STRING)"), keySchema).as("pk"),
        expr("CAST(value AS STRING)").as("vjson"), col("off"))
      .select(col("pk.k").as("k"),
        from_json(col("vjson"), valSchema).getField("v").as("v"),
        col("vjson").isNull.as("del"), col("off"))
    val state = StreamingPipelines.compactBatch(replay, Seq("k"), "off")
      .filter(!col("del")).select("k", "v").as[(String, String)].collect().toMap
    assert(state == Map("k1" -> "b"), s"k2 was tombstoned last: $state")
  }
}
