package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** K5/K6 end-to-end: the dim-store leg of the CDC router. Reference:
  * rt-flink TableProcessFunction.scala:101-137 (dynamic DDL) +
  * DimSink.scala:27-57 (per-row Phoenix upsert). Here the DDL goes
  * through the session catalog and the upsert is one last-write-wins
  * window per micro-batch; enrichment re-reads (and broadcasts) the
  * table per batch, so invalidation is by construction.
  */
class DimStoreSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val db = "graft_dim_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    super.afterAll()
  }

  test("ensureDimTable is idempotent and creates payload + __seq columns") {
    DimStore.ensureDimTable(spark, db, "dim_user", Seq("id", "name", "tier"))
    DimStore.ensureDimTable(spark, db, "dim_user", Seq("id", "name", "tier"))
    val cols = spark.table(s"`$db`.`dim_user`").columns.toSeq
    assert(cols == Seq("id", "name", "tier", "__seq"))
  }

  test("upsert: later __seq wins, incoming beats existing on __seq ties") {
    DimStore.ensureDimTable(spark, db, "dim_t1", Seq("id", "v"))
    DimStore.upsert(spark, db, "dim_t1", Seq(("1", "a"), ("2", "b")).toDF("id", "v"), "id", seq = 0L)
    // same seq (checkpoint replayed batch): incoming still wins the tie
    DimStore.upsert(spark, db, "dim_t1", Seq(("1", "a2")).toDF("id", "v"), "id", seq = 0L)
    // later batch updates key 2, inserts key 3
    DimStore.upsert(spark, db, "dim_t1", Seq(("2", "b2"), ("3", "c")).toDF("id", "v"), "id", seq = 1L)
    val got = DimStore.dimTable(spark, db, "dim_t1")
      .as[(String, String)].collect().toMap
    assert(got == Map("1" -> "a2", "2" -> "b2", "3" -> "c"))
  }

  test("upsert within-batch ties: ordCol picks the stream-order winner") {
    DimStore.ensureDimTable(spark, db, "dim_t2", Seq("id", "v"))
    val batch = Seq(("1", "first", 10L), ("1", "last", 20L))
      .toDF("id", "v", "__off")
    DimStore.upsert(spark, db, "dim_t2", batch, "id", seq = 0L, ordCol = Some("__off"))
    val got = DimStore.dimTable(spark, db, "dim_t2").as[(String, String)].head()
    assert(got == ("1", "last"))
  }

  test("one batch with insert+update for a key: ordCol plumbed through routeCdc resolves in stream order") {
    // The reference's DimSink applies CDC rows in arrival order, so when
    // one micro-batch carries insert(tier=silver) then update(tier=gold)
    // for the same key, gold must win. The values are chosen so the
    // no-ordCol payload-tuple fallback would pick the WRONG row
    // ("silver" > "gold" lexicographically) — this spec fails if the
    // ordCol plumbing drops out anywhere along routeCdc → dimUpsertSink
    // → upsert.
    val config = Seq(
      ("user_info", "insert", "hbase", "dim_user_tie", "id,name,tier"),
      ("user_info", "update", "hbase", "dim_user_tie", "id,name,tier"))
      .toDF("source_table", "operate_type", "sink_type", "sink_table", "sink_columns")

    val input = MemoryStream[(String, String, String, Long)]
    val cdc = input.toDF().toDF("table", "type", "data", "offset")
    val routed = graft.apps.Pipelines.routeCdc(cdc, config, ordCol = Some("offset"))
    val sink = DimStore.dimUpsertSink(spark, db,
      config = Map("dim_user_tie" -> Seq("id", "name", "tier")),
      ordCol = Some("offset"))
    val q = routed.writeStream.foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("dimck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()

    input.addData(
      ("user_info", "insert", """{"id":"9","name":"cy","tier":"silver"}""", 1L),
      ("user_info", "update", """{"id":"9","name":"cy","tier":"gold"}""", 2L))
    q.processAllAvailable(); q.stop()

    val got = DimStore.dimTable(spark, db, "dim_user_tie")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("9", "cy", "gold")),
      s"stream-order (offset) winner expected, got $got")

    // next-batch enrichment observes the stream-order winner
    val facts = Seq((200L, "9")).toDF("order_id", "user_id")
    val dim = DimStore.dimTable(spark, db, "dim_user_tie")
    val enriched = facts.join(broadcast(dim), facts("user_id") === dim("id"))
      .select("order_id", "tier").as[(Long, String)].collect().toSet
    assert(enriched == Set((200L, "gold")))
  }

  test("CDC stream -> routeCdc -> dimUpsertSink; next-batch broadcast join sees the update") {
    val config = Seq(
      ("user_info", "insert", "hbase", "dim_user_info", "id,name,tier"),
      ("user_info", "update", "hbase", "dim_user_info", "id,name,tier"))
      .toDF("source_table", "operate_type", "sink_type", "sink_table", "sink_columns")

    val input = MemoryStream[(String, String, String)]
    val cdc = input.toDF().toDF("table", "type", "data")
    val routed = graft.apps.Pipelines.routeCdc(cdc, config)
    val sink = DimStore.dimUpsertSink(spark, db,
      config = Map("dim_user_info" -> Seq("id", "name", "tier")))
    val q = routed.writeStream.foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("dimck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()

    input.addData(
      ("user_info", "insert", """{"id":"7","name":"ann","tier":"bronze","secret":"x"}"""),
      ("user_info", "insert", """{"id":"8","name":"bo","tier":"silver"}"""))
    q.processAllAvailable()
    // a later micro-batch upgrades user 7's tier
    input.addData(("user_info", "update", """{"id":"7","name":"ann","tier":"gold"}"""))
    q.processAllAvailable(); q.stop()

    // enrichment path: broadcast-join facts against the CURRENT dim table
    val facts = Seq((100L, "7"), (101L, "8")).toDF("order_id", "user_id")
    val dim = DimStore.dimTable(spark, db, "dim_user_info")
    val enriched = facts.join(broadcast(dim), facts("user_id") === dim("id"))
      .select("order_id", "name", "tier")
      .as[(Long, String, String)].collect().toSet
    assert(enriched == Set((100L, "ann", "gold"), (101L, "bo", "silver")))
    // sink_columns pruning dropped the unconfigured field
    assert(!dim.columns.contains("secret"))
  }
}
