package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Delta-cost probe for
  * [[graft.ops.Dedup.hammingPairsIncremental]] /
  * [[graft.ops.Multimodal.mediaPairsIncremental]] — the StreamingMedia
  * per-batch contract: with a FIXED fingerprint batch, growing the
  * STANDING fingerprint table ×10 must not grow the per-batch SHUFFLE
  * (the batch's chunked keys broadcast; the standing side streams
  * through the join unshuffled; the only exchange is the pair-sized
  * dropDuplicates). Wall grows with the standing scan, shuffle records
  * must not.
  *
  *   Test/runMain graft.tools.MediaDeltaProbe
  */
object MediaDeltaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shufRecords = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shufRecords.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
        ()
      }
    })
    def kindOf(c: org.apache.spark.sql.Column) =
      when(pmod(c, lit(3L)) === 0L, lit("audio")).otherwise(lit("image"))
    // fixed batch: 2k fingerprints; every 20th is a PLANTED near-dup of
    // a standing row (fp equal up to one low bit), the rest xxhash-
    // scattered so chunk-key matches stay sparse — the daily-delta
    // regime the sink is for
    val batchN = 2000L
    val batch = spark.range(batchN).select(
        (col("id") + lit(10000000000L)).as("media_id"),
        kindOf(col("id")).as("kind"),
        when(pmod(col("id"), lit(20L)) === 0L,
          xxhash64(col("id") * 7L).bitwiseXOR(lit(1L)))
          .otherwise(xxhash64(col("id") + lit(5000000000L))).as("fp"))
      .localCheckpoint(true)
    val nBatch = batch.count()
    for (mult <- Seq(1, 4, 10)) {
      val standingN = 200000L * mult
      val standing = spark.range(standingN).select(
          col("id").as("media_id"), kindOf(col("id")).as("kind"),
          xxhash64(col("id") * 7L).as("fp"))
        .localCheckpoint(true)
      val nStanding = standing.count()
      val t0 = System.nanoTime()
      val s0 = shufRecords.get()
      val pairs = graft.ops.Multimodal.mediaPairsIncremental(
        batch, standing, maxHamming = 4)
      val nPairs = pairs.count()
      println(f"MEDIADELTA standing=$nStanding%-8d batch=$nBatch " +
        f"pairs=$nPairs t=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"shufRec=${shufRecords.get() - s0}")
      if (sys.env.contains("MEDIA_EXPLAIN") && mult == 10)
        println(pairs.queryExecution.executedPlan.toString.take(8000))
      graft.ops.CacheScope.release(spark)
    }
    spark.stop()
  }
}
