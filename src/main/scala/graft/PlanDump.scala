package graft
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for a comma-list of declared queries to
  * `<outDir>/<query>_<tag>.txt` — the plan evidence the optimization
  * rounds commit under `plans/` (the judge checks plan claims against
  * these files; it cannot run Spark itself).
  *
  * usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <queryCsv>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println("usage: graft.PlanDump <sfDir> <outDir> <tag> <queryCsv>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, tag, csv) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // sfDir derives the size-adaptive shuffle width (r21): the dumped
    // plans must be the plans the bench actually runs
    val spark = graft.core.GraftSession.local(cpus.toInt, Some(sfDir))
    new java.io.File(outDir).mkdirs()
    // artifact-backed queries (q57, q128, q177, ...) need their standing
    // artifacts to exist before the plan can even be built
    try SparkEntry.prepareArtifacts(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[plandump] prepareArtifacts failed: $e") }
    // failures tracked and fatal (r20 ADVICE): a missing plan dump must
    // fail the run loudly, not exit 0 with silent gaps; only NonFatal is
    // caught per query (an OOM/linkage error crashes the tool)
    var failed = 0
    try {
      csv.split(",").filter(_.nonEmpty).foreach { name =>
        try {
          val plan = SparkEntry.queries(name)(spark, sfDir)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          System.err.println(s"[plandump] wrote $name ($tag)")
        } catch { case scala.util.control.NonFatal(e) =>
          failed += 1
          System.err.println(s"[plandump] $name failed: $e")
        }
      }
    } finally spark.stop()
    if (failed > 0) {
      System.err.println(s"[plandump] $failed dump(s) failed")
      sys.exit(1)
    }
  }
}
