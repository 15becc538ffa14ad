package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch: measure Structured Streaming throughput (rows/s) so the
  * streaming claims carry a number (SCALE.md). Two pipelines:
  *  1. the full training-data ingest loop (gate → redact → incremental
  *     dedup vs all history → corpus/index append) over real corpus
  *     text — the heavyweight stateful path;
  *  2. a stateless windowed aggregation (the visitor-stats shape) —
  *     the lightweight path, for contrast.
  * MemoryStream + processAllAvailable: measures the engine, not a
  * source. Single JVM local[16]; a cluster scales by partitions.
  */
object StreamingThroughput {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val db = "graft_throughput"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    spark.sql(s"CREATE DATABASE `$db`")

    // real corpus text, fresh ids, nBatches batches
    val texts = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("text")).as[String].collect()
    val nBatches = 10
    val perBatch = texts.length // replay the corpus once per batch, new ids

    // --- 1. ingest loop ---
    val sink = graft.streaming.IngestPipeline.trainingIngestSink(spark, db,
      "thr_corpus", "thr_index", "doc_id", "text",
      shingleN = 5, k = 32, bands = 8, threshold = 0.8) {
      (pairs, _, _) => pairs.count(); ()
    }
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("thrck").toString)
      .trigger(Trigger.ProcessingTime(0)).start()
    // batch 0 outside the timer: table/index creation + first plans
    input.addData(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq: _*)
    q.processAllAvailable()
    val t0 = System.nanoTime()
    for (b <- 1 until nBatches) {
      input.addData(texts.zipWithIndex.map { case (t, i) =>
        ((b.toLong * perBatch + i).toLong, t)
      }.toSeq: _*)
      q.processAllAvailable()
    }
    val ingestSec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val ingestRows = perBatch.toLong * (nBatches - 1)
    println(f"ingest: $ingestRows rows in $ingestSec%.1f s = ${ingestRows / ingestSec}%.0f rows/s " +
      f"($nBatches batches of $perBatch docs, dedup-vs-history each batch)")

    // --- 2. stateless windowed agg (visitor-stats shape) ---
    val ev = MemoryStream[(java.sql.Timestamp, Long, String)]
    val agg = ev.toDF().toDF("ts", "user_id", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("pv"), approx_count_distinct(col("user_id")).as("uv"))
    val q2 = agg.writeStream.outputMode("update")
      .format("memory").queryName("thr_agg")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("thrck2").toString)
      .trigger(Trigger.ProcessingTime(0)).start()
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val evRows = 200000
    def evBatch(b: Int): Seq[(java.sql.Timestamp, Long, String)] =
      (0 until evRows).map { i =>
        (new java.sql.Timestamp(base + (b.toLong * evRows + i) * 10),
          (i % 5000).toLong, if (i % 3 == 0) "click" else "view")
      }
    ev.addData(evBatch(0): _*); q2.processAllAvailable()
    val t1 = System.nanoTime()
    for (b <- 1 until 5) { ev.addData(evBatch(b): _*); q2.processAllAvailable() }
    val aggSec = (System.nanoTime() - t1) / 1e9
    q2.stop()
    println(f"windowed-agg: ${evRows * 4} rows in $aggSec%.1f s = ${evRows * 4 / aggSec}%.0f rows/s")

    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    spark.stop()
  }
}
