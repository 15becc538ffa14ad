package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print the executed plan of one or more queries at sf0.001
  * for SCALE.md's plan-audit table.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- qs) {
      val p = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"=== $q  (exchanges: ${p.linesIterator.count(_.contains("Exchange hashpartitioning"))})")
      println(p)
    }
    spark.stop()
  }
}
