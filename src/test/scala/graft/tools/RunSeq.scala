package graft.tools

/** Replay a SLICE of the bench sequence with the exact suite instrument
  * (warmup, prebuilt artifacts, median of 3 cold reps, blocking
  * releaseAll between reps) — the adjudication tool for in-suite vs
  * cold-isolated disagreements: bisect which neighbor's retained state
  * inflates a later query (the r12 q108 case: 5.08 s in-suite vs
  * 2.93 s isolated).
  *
  * Usage: RunSeq <sfDir> <name1,name2,...>  (names run in given order)
  */
object RunSeq {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try {
      graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
      graft.SparkEntry.queries("q19_dedup_exact")(spark, sfDir).count()
    } catch { case _: Throwable => () }
    try graft.SparkEntry.prepareArtifacts(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[runseq] artifacts: $e") }
    graft.Bench.releaseAll(spark)
    names.foreach { name =>
      val runs = (0 until 3).map { _ =>
        val r = graft.Bench.runTimed(spark, name, sfDir)
        graft.Bench.releaseAll(spark)
        r
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"SEQ $name med=$med%.2f reps=${runs.map(r => f"${r._1}%.2f").mkString(",")} err=${runs.exists(_._2)}")
    }
    spark.stop()
  }
}
