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
  *
  * Delivery semantics: every sink here is AT-LEAST-ONCE — a failure
  * between sink write and checkpoint commit replays the last batch.
  * Each keyed/windowed output therefore stamps a deterministic
  * idempotence key and downstream consumers dedup/upsert on it (the
  * reference's ClickHouse ReplacingMergeTree contract). The exact
  * duplicate window and the consumer obligations are documented in
  * COVERAGE.md §2.13 ("The at-least-once duplicate window, precisely").
  */
object StreamingPipelines {

  /** S1/S2 — Kafka JSON source: subscribe + parse + watermark. The
    * standard shape for every reference pipeline's head
    * (rt-flink KafkaUtil.scala:18-23,41-56).
    */
  def kafkaJsonSource(spark: SparkSession, bootstrap: String, topic: String,
                      groupId: String, schema: org.apache.spark.sql.types.StructType,
                      watermark: Option[(String, String)] = None): DataFrame =
    parseKafkaJson(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("kafka.group.id", groupId)
        .option("startingOffsets", "earliest")
        .load(),
      schema, watermark)

  /** The S1/S2 value-side ingest projection, factored out of
    * [[kafkaJsonSource]] so a wire replay (binary `value` bytes read
    * back from ANY store — the KafkaWireSpec parquet topic, a broker
    * dump, a DLQ) goes through the IDENTICAL parse path the production
    * source uses: value bytes → UTF-8 string → `from_json` under
    * `schema` → columns, optional watermark. Works on batch and
    * streaming frames alike.
    */
  def parseKafkaJson(raw: DataFrame, schema: org.apache.spark.sql.types.StructType,
                     watermark: Option[(String, String)] = None): DataFrame = {
    val parsed = raw
      .selectExpr("CAST(value AS STRING) AS json")
      .select(from_json(col("json"), schema).as("r"))
      .select(col("r.*"))
    watermark.fold(parsed) { case (c, delay) => parsed.withWatermark(c, delay) }
  }

  /** The exact bytes Spark's Kafka sink hands the producer: `key` and
    * `value` cast to BINARY (UTF-8 of the JSON/string payloads — the
    * sink's own string→bytes coercion), `topic` passed through when
    * present. NULL values stay NULL — the S3 tombstone contract rides
    * on that. Writing this frame to a keyed store (the `kafka` format
    * in production; a parquet "topic" in the broker-less wire spec)
    * preserves the broker-visible record bytes.
    */
  def toWireBytes(producerShape: DataFrame): DataFrame = {
    val cols = producerShape.columns
    val sel = Seq(
      (if (cols.contains("key")) col("key").cast("binary")
       else lit(null).cast("binary")).as("key"),
      col("value").cast("binary").as("value")) ++
      (if (cols.contains("topic")) Seq(col("topic")) else Nil)
    producerShape.select(sel: _*)
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

  /** S3 — upsert-Kafka PRODUCER shape (ref: OdsCreateKafkaTable.scala:50-69,
    * the `'connector' = 'upsert-kafka'` table with `PRIMARY KEY`).
    * Flink's upsert-kafka emits one keyed record per changelog row: key =
    * JSON of the PK columns, value = JSON of all columns
    * (`'value.fields-include' = 'ALL'`), and a NULL value tombstone for
    * deletes. Spark's Kafka sink honors `key`/`value` columns, so the
    * whole connector is this projection. Rows where `deleteCol` is true
    * become tombstones.
    *
    * Within one micro-batch the reference producer emits rows in stream
    * order and the compacted topic keeps the last — `compactBatch`
    * reproduces that: latest row per key by `ordCol` survives, so one
    * record per key per batch reaches the topic (same wire state, fewer
    * records).
    */
  def toUpsertKafkaShape(changelog: DataFrame, keyCols: Seq[String],
                         deleteCol: Option[String] = None): DataFrame = {
    val payload = changelog.columns.filterNot(deleteCol.contains)
    // 'value.fields-include' = 'ALL' serializes null columns explicitly;
    // Spark's to_json drops them by default — keep the wire formats equal
    val jsonOpts = Map("ignoreNullFields" -> "false")
    val value = to_json(struct(payload.map(col): _*), jsonOpts)
    changelog.select(
      to_json(struct(keyCols.map(col): _*), jsonOpts).as("key"),
      deleteCol.fold(value)(d =>
        when(col(d), lit(null: String)).otherwise(value)).as("value"))
  }

  /** S3 — keyed last-write-wins compaction of one changelog batch:
    * latest row per `keyCols` by `ordCol` (Kafka offset / CDC sequence)
    * wins. This is both the producer's per-batch dedup and the
    * consumer's replay-collapse (a compacted topic read from earliest is
    * just one big batch).
    */
  def compactBatch(batch: DataFrame, keyCols: Seq[String], ordCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(ordCol).desc)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** S3 — upsert-Kafka CONSUMER: materialize the current table state
    * from a changelog stream into a catalog parquet table (the Spark
    * stand-in for Flink's dynamic table over an upsert-kafka source).
    * Per micro-batch: compact by offset, merge against the existing
    * state with a last-write-wins window over (`__seq`, batch ordinal),
    * and drop keys whose WINNING record is a tombstone (`isDelete`) —
    * Flink's `-D` row kind. Fully distributed: the only shuffle carries
    * the table's rows, keyed.
    */
  def upsertKafkaMaterialize(spark: SparkSession, db: String, table: String,
                             keyCols: Seq[String], ordCol: String,
                             deleteCol: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      // ordCol and deleteCol are changelog METADATA (Flink row kind +
      // offset), not table columns — consumed here, never stored.
      // a NULL delete flag means "not a delete" — without the coalesce,
      // !__del filters NULL rows out and silently deletes those keys
      val incoming = compactBatch(batch, keyCols, ordCol)
        .withColumn("__del", coalesce(col(deleteCol).cast("boolean"), lit(false)))
        .withColumn("__seq", lit(batchId))
        .drop(ordCol, deleteCol)
      val payload = incoming.columns
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
      val targetCols = payload.map {
        case "__seq" => "`__seq` BIGINT"
        case "__del" => "`__del` BOOLEAN"
        case c => s"`$c` STRING"
      }.mkString(", ")
      spark.sql(s"CREATE TABLE IF NOT EXISTS `$db`.`$table` ($targetCols) USING PARQUET")
      val existing = spark.table(s"`$db`.`$table`")
      // Fixed-schema precondition (the upsert-kafka table is DDL'd once,
      // like the reference's CREATE TABLE): a drifting changelog fails
      // HERE with the column diff, not mid-union with an opaque error.
      val missing = existing.columns.toSet -- payload.toSet
      val extra = payload.toSet -- existing.columns.toSet
      require(missing.isEmpty && extra.isEmpty,
        s"upsert-kafka batch schema drifted from `$db`.`$table`: " +
          s"missing=${missing.mkString(",")} extra=${extra.mkString(",")}")
      val stringified = incoming.select(payload.map {
        case c @ ("__seq" | "__del") => col(c)
        case c => col(c).cast("string").as(c)
      }: _*)
      // the shared keyed LWW merge (DimStore owns the one definition);
      // tombstoned winners (__del) drop from the rewritten table
      DimStore.lwwOverwrite(db, table, existing, stringified, keyCols,
        keepRow = !col("__del"))
    }

  /** Read the materialized upsert-kafka table (current per-key state). */
  def upsertKafkaTable(spark: SparkSession, db: String, table: String): DataFrame =
    spark.table(s"`$db`.`$table`").drop("__seq", "__del")

  /** Start a memory-sink query for tests: append mode, processes all
    * available then returns the query for `processAllAvailable()`.
    */
  def startMemorySink(df: DataFrame, name: String,
                      mode: String = "append"): StreamingQuery =
    df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
}
