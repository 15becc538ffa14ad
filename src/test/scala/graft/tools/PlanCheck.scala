package graft.tools
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      val ex = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      println(s"=== $q exchanges=$ex")
      println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan") || l.contains("Window") || l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin")).take(12).mkString("\n"))
    }
    spark.stop()
  }
}
