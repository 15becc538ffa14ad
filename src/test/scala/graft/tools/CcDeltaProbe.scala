package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Delta-cost probe for [[graft.ops.Dedup.connectedComponentsIncremental]]
  * — the StreamingCc per-batch contract: with a FIXED delta, growing
  * the STANDING label table ×10 must grow the per-batch shuffle by
  * ~nothing (the standing table is scanned twice — semi-reduction and
  * remap — but never shuffled; every exchange carries delta-sized
  * rows). Wall grows with the scan, shuffle records must not.
  *
  *   Test/runMain graft.tools.CcDeltaProbe /root/testdata/sf0.1
  */
object CcDeltaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    // the q174 synthesis as the delta: ~1.5 edges per doc over doc ids
    val delta = docs
      .select(col("doc_id"),
        explode(sequence(lit(1L), lit(1L) + pmod(col("doc_id"), lit(2L)))).as("k"))
      .select(col("doc_id").as("id_a"),
        pmod(col("doc_id") * 37L + col("k") * 101L, lit(n)).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(pmod(col("id_a"), lit(50L)) === 0L) // ~2% of docs: the daily delta
      .localCheckpoint(true)
    val nDelta = delta.count()
    // standing labels synthesized directly (size is what matters, the
    // remap/semi joins don't care how the labeling arose): ×1 = the
    // doc-id range, ×10 = ten shifted replicas
    for (mult <- Seq(1, 4, 10)) {
      val standing = (0 until mult).map { r =>
        spark.range(n).select(
          (col("id") + lit(r.toLong * 1000000000L)).as("id"),
          ((col("id") - pmod(col("id"), lit(10L))) +
            lit(r.toLong * 1000000000L)).as("label"))
      }.reduce(_ unionByName _).localCheckpoint(true)
      val nStanding = standing.count()
      val t0 = System.nanoTime()
      val s0 = shufRecords.get()
      val out = graft.ops.Dedup.connectedComponentsIncremental(standing, delta)
      val rows = out.count()
      println(f"CCDELTA standing=$nStanding%-9d delta=$nDelta rows=$rows " +
        f"t=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"shufRec=${shufRecords.get() - s0}")
      graft.ops.CacheScope.release(spark)
    }
    spark.stop()
  }
}
