package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: measure the driver-round-trip amortization of
  * `BpeTrain.learnMerges(mergeBatch = m)` — Spark jobs (≈ count+argmax
  * round trips) per learned merge — on the fixture documents table, to
  * back the SCALE.md record. Equivalence itself is spec-gated
  * (BpeTrainSpec); this probe prices it.
  */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val nMerges = if (args.length > 1) args(1).toInt else 40
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, sfDir, "documents").select("text")
    // two passes; the first warms JIT/codegen so m=1 (run first) is not
    // penalized — read the SECOND pass's walls
    for (pass <- 1 to 2; m <- Seq(1, 4, 8, 16)) {
      val _ = pass
      val counter = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          counter.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val n = graft.ops.BpeTrain.learnMerges(docs, "text", nMerges,
        mergeBatch = m).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(l)
      println(f"mergeBatch=$m%2d merges=$n jobs=${counter.get} " +
        f"jobsPerMerge=${counter.get.toDouble / n}%.2f wall=$dt%.1fs")
    }
    spark.stop()
  }
}
