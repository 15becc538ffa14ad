package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object JobFloor {
  def main(args: Array[String]): Unit = {
    for ((aqe, parts) <- Seq(("true", "16"), ("false", "16"), ("true", "4"), ("false", "4"), ("false", "1"))) {
      val spark = SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      (1 to 10).foreach { _ =>
        spark.range(1000).groupBy((col("id") % 10).as("g")).count().count()
      }
      val t0 = System.nanoTime()
      (1 to 20).foreach { _ =>
        spark.range(1000).groupBy((col("id") % 10).as("g")).count().count()
      }
      println(f"aqe=$aqe parts=$parts: ${(System.nanoTime() - t0) / 20e6}%.0f ms per shuffle-query")
      spark.stop()
    }
  }
}
