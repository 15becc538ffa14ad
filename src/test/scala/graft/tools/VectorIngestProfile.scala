package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Similarity

/** Scratch: measure the streaming EMBEDDING ingest loop's throughput
  * (vectors/s) so the VectorIngest claims carry a number (the
  * StreamingThroughput doctrine applied to the vector sink). Replays
  * the sf embeddings corpus once per batch under fresh ids — every
  * batch pays id-dedup vs the growing index, delta encode, drift
  * check, append, and the visibility barrier. MemoryStream +
  * processAllAvailable: measures the engine, not a source.
  */
object VectorIngestProfile {
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

    val db = "graft_vthroughput"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    spark.sql(s"CREATE DATABASE `$db`")

    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    val vecs = emb.as[(Long, Seq[Float])].collect()
    val perBatch = vecs.length
    val nBatches = 10

    // durable (lineage-free) models + training-time error, once
    def materialize(df: org.apache.spark.sql.DataFrame) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(df.collect().toSeq), df.schema)
    val cents = materialize(Similarity.trainCentroids(emb, nCells = 8, iters = 2))
    val books = materialize(
      Similarity.trainProductQuantizer(emb, nSub = 8, k = 32, iters = 2))
    val baseErr = Similarity.pqSelfErrorE6(
        emb, Similarity.pqIndex(emb, cents, books, nSub = 8), books)
      .select($"mean_sq_err_e6").head().getLong(0)
    graft.ops.CacheScope.release(spark)

    val sink = graft.streaming.VectorIngest.pqIngestSink(spark, db,
      "vthr_index", cents, books, nSub = 8, baseErrE6 = baseErr) {
      (_, _, _, _) => ()
    }
    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("vthrck").toString)
      .trigger(Trigger.ProcessingTime(0)).start()
    // batch 0 outside the timer: DDL + first plans + JIT
    input.addData(vecs.map { case (id, e) => (id, e) }.toSeq: _*)
    q.processAllAvailable()
    val t0 = System.nanoTime()
    for (b <- 1 until nBatches) {
      input.addData(vecs.map { case (id, e) =>
        (b.toLong * perBatch + id, e)
      }.toSeq: _*)
      q.processAllAvailable()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    val total = spark.table(s"`$db`.`vthr_index`").count()
    println(f"VINGEST batches=${nBatches - 1} perBatch=$perBatch " +
      f"rows/s=${(nBatches - 1) * perBatch / secs}%.0f wall=$secs%.1f s " +
      s"indexRows=$total")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    spark.stop()
  }
}
