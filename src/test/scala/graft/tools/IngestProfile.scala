package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.{Dedup, Quality}

/** Scratch: per-batch cost breakdown of the ingest sink — replicates
  * the sink's phases (r10 small-batch profile) with timers so the fixed
  * per-trigger overhead can be attributed.
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    @volatile var traceStages = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        if (traceStages) {
          val si = s.stageInfo
          val wall = (for (a <- si.completionTime; b <- si.submissionTime)
            yield (a - b) / 1e3).getOrElse(-1.0)
          println(f"      STG wall=$wall%5.2f tasks=${si.numTasks}%3d ${si.name.takeWhile(_ != '\n').take(70)}")
        }
      }
    })

    val db = "graft_profile"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    spark.sql(s"CREATE DATABASE `$db`")

    val texts = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("text")).as[String].collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val j0 = jobs.get()
      val r = f
      println(f"    $label: ${(System.nanoTime() - t0) / 1e9}%.2f s jobs=${jobs.get() - j0}")
      r
    }

    graft.streaming.StreamingDedup.ensureTables(spark, db, "p_corpus", "p_index", 32)
    for (b <- 0 until 6) {
      val batch = texts.zipWithIndex.map { case (tx, i) =>
        (b.toLong * texts.length + i, tx)
      }.toSeq.toDF("doc_id", "text")
      val t0 = System.nanoTime()
      val gated = batch
        .withColumn("__reason", Quality.gateReason(col("text")))
        .persist()
      val dropped = t("gate count") {
        gated.filter(col("__reason") =!= "keep").count()
      }
      val redacted = gated.filter(col("__reason") === "keep")
        .drop("__reason")
        .withColumn("text", TextFunctions.redactPii(col("text")))
      val bb = redacted.select(col("doc_id").cast("long").as("doc_id"),
        col("text").cast("string").as("text")).persist()
      val preexisting = spark.sparkContext.getPersistentRDDs.keySet
      val corpus = spark.table(s"`$db`.`p_corpus`")
        .select(col("id").as("doc_id"), col("text").as("text"))
      val index = spark.table(s"`$db`.`p_index`")
      val (pairs, newSigs) = t("plan pairs") {
        Dedup.minhashLshIncrementalWithIndex(bb, corpus, index,
          "doc_id", "text", 5, 32, 8, 0.8, smallBatch = true)
      }
      traceStages = b == 5
      t("pairs.count") { pairs.count() }
      traceStages = false
      t("parallel appends") {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val fi = Future {
          newSigs.coalesce(1).write.mode("append").insertInto(s"`$db`.`p_index`")
        }
        val fc = Future {
          bb.select(col("doc_id").as("id"), col("text").as("text")).coalesce(1)
            .write.mode("append").insertInto(s"`$db`.`p_corpus`")
        }
        Await.result(fi, Duration.Inf); Await.result(fc, Duration.Inf)
      }
      t("unpersist") {
        spark.sparkContext.getPersistentRDDs
          .filter { case (rddId, _) => !preexisting.contains(rddId) }
          .values.foreach(_.unpersist(blocking = false))
        gated.unpersist(); bb.unpersist()
      }
      println(f"batch $b ($dropped dropped): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    spark.stop()
  }
}
