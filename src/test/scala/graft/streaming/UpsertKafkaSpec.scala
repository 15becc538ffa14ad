package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S3 — upsert-Kafka changelog semantics (ref: OdsCreateKafkaTable
  * .scala:50-69, the `'connector' = 'upsert-kafka'` PRIMARY KEY table).
  * Producer: keyed (key,value) records with NULL-value tombstones.
  * Consumer: per-key last-write-wins materialization across
  * micro-batches, tombstone deletes the key.
  */
class UpsertKafkaSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val db = "graft_upsert_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    super.afterAll()
  }

  test("producer shape: key = PK json, value = all-fields json, delete -> tombstone") {
    val changelog = Seq(
      ("2024-01-01", "09:01", 10L, false),
      ("2024-01-01", "09:02", 7L, true)) // retraction
      .toDF("do_date", "do_min", "pv", "__is_delete")
    val recs = StreamingPipelines.toUpsertKafkaShape(
      changelog, keyCols = Seq("do_date", "do_min"), deleteCol = Some("__is_delete"))
      .as[(String, String)].collect().sortBy(_._1)
    assert(recs.map(_._1).toSeq == Seq(
      """{"do_date":"2024-01-01","do_min":"09:01"}""",
      """{"do_date":"2024-01-01","do_min":"09:02"}"""))
    assert(recs(0)._2.contains("\"pv\":10"))
    assert(recs(1)._2 == null) // tombstone
  }

  test("compactBatch keeps the latest record per key by offset") {
    val batch = Seq(
      ("k1", "v1", 1L), ("k1", "v2", 3L), ("k1", "v-mid", 2L), ("k2", "w1", 5L))
      .toDF("k", "v", "off")
    val got = StreamingPipelines.compactBatch(batch, Seq("k"), "off")
      .select("k", "v").as[(String, String)].collect().toMap
    assert(got == Map("k1" -> "v2", "k2" -> "w1"))
  }

  test("consumer: per-key latest wins across micro-batches, tombstone deletes") {
    val input = MemoryStream[(String, String, Long, Boolean)]
    val changelog = input.toDF().toDF("k", "v", "off", "del")
    val sink = StreamingPipelines.upsertKafkaMaterialize(
      spark, db, "pvuv_state", keyCols = Seq("k"), ordCol = "off",
      deleteCol = "del")
    val q = changelog.writeStream.foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("upck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()

    // batch 0: two keys, k1 updated twice within the batch (offset order wins)
    input.addData(("k1", "a", 1L, false), ("k1", "b", 2L, false), ("k2", "x", 3L, false))
    q.processAllAvailable()
    // batch 1: update k2, delete k1, insert k3
    input.addData(("k2", "y", 4L, false), ("k1", "dead", 5L, true), ("k3", "z", 6L, false))
    q.processAllAvailable()
    // batch 2: k1 reappears after its delete (insert-after-delete)
    input.addData(("k1", "alive", 7L, false))
    q.processAllAvailable(); q.stop()

    val state = StreamingPipelines.upsertKafkaTable(spark, db, "pvuv_state")
      .as[(String, String)].collect().toMap
    assert(state == Map("k1" -> "alive", "k2" -> "y", "k3" -> "z"))
  }
}
