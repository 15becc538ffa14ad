package graft.tools

import org.apache.spark.sql.SparkSession

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

/** Minimal reproduction attempt for the stale-catalog-table read behind
  * the IngestPipelineSpec flake, WITHOUT streaming: sequentially read
  * two catalog tables, append to BOTH from two concurrent futures
  * (exactly the sink's pattern), read again, and check the new rows are
  * visible. A miss here = the concurrent insertInto/cache-refresh race
  * alone explains the flake; all-clean = the streaming session clone is
  * part of the mechanism.
  *
  * Run: sbt -batch "Test/runMain graft.tools.CatalogRaceStress 500"
  */
object CatalogRaceStress {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("catalog-race-stress")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val db = "cat_race"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`t1`")
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`t2`")
    spark.sql(s"CREATE TABLE `$db`.`t1` (`id` BIGINT, `v` STRING) USING PARQUET")
    spark.sql(s"CREATE TABLE `$db`.`t2` (`id` BIGINT, `v` STRING) USING PARQUET")

    var failures = 0
    (1 to iters).foreach { i =>
      // read BEFORE the append (caches the relation, like the sink's
      // batch-N read preceding its appends)
      val pre1 = spark.table(s"`$db`.`t1`").count()
      val pre2 = spark.table(s"`$db`.`t2`").count()
      val f1 = Future {
        Seq((i.toLong, s"a$i")).toDF("id", "v").coalesce(1)
          .write.mode("append").insertInto(s"`$db`.`t1`")
      }
      val f2 = Future {
        Seq((i.toLong, s"b$i")).toDF("id", "v").coalesce(1)
          .write.mode("append").insertInto(s"`$db`.`t2`")
      }
      Await.result(f1, Duration.Inf)
      Await.result(f2, Duration.Inf)
      val post1 = spark.table(s"`$db`.`t1`").count()
      val post2 = spark.table(s"`$db`.`t2`").count()
      if (post1 != i.toLong || post2 != i.toLong) {
        failures += 1
        println(s"=== ITER $i STALE: pre=($pre1,$pre2) post=($post1,$post2) expected ($i,$i)")
      }
      if (i % 100 == 0) println(s"iter $i ok (t1=$post1 t2=$post2)")
    }
    println(s"DONE failures=$failures/$iters")
    spark.sql(s"DROP DATABASE `$db` CASCADE")
    spark.stop()
  }
}
