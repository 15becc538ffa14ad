package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time one query by name on a given sf dir. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("RUNONE_STAGES")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for (a <- si.completionTime; b <- si.submissionTime)
            yield (a - b) / 1e3).getOrElse(-1.0)
          val run = si.taskMetrics.executorRunTime / 1e3
          val gc = si.taskMetrics.jvmGCTime / 1e3
          println(f"  STG ${si.stageId}%3d wall=$wall%6.2f run=$run%7.2f gc=$gc%6.2f tasks=${si.numTasks}%3d ${si.name.take(60)}")
        }
      })
    }
    val reps = sys.env.getOrElse("RUNONE_REPS", "2").toInt
    // RUNONE_FULL=1 materializes via toRdd.count() like Bench — a plain
    // Dataset.count() lets Catalyst ELIMINATE left-joined aggregates
    // grouped by the join key (r12: q129's whole n-gram pass vanished
    // and "cold 4.2 s" measured a base scan; Bench said 27 s)
    val full = sys.env.contains("RUNONE_FULL")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val n = if (full) df.queryExecution.toRdd.count() else df.count()
      println(f"RESULT $name rep=$r rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    if (args.length > 2 && args(2) == "explain")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    if (args.length > 2 && args(2) == "show")
      graft.SparkEntry.queries(name)(spark, sfDir).show(20, truncate = false)
    spark.stop()
  }
}
