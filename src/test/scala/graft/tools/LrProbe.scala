package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.QualityClassifier

/** Scratch: calibrate the q191 accuracy floor — held-out accuracy of
  * the fixed-point logistic classifier on the planted-marker fixture
  * at each sf, for gMul 16 (the shipped value) and gMul 4 (the
  * negative control: the step size that diverges).
  */
object LrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def aug(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(5L)) === 4L, lit(""))
            .when(pmod(col("doc_id"), lit(4L)) <= 1L, lit(" qmk qmk qmk"))
            .otherwise(lit(" jmk jmk jmk"))).as("text"),
        (pmod(col("doc_id"), lit(4L)) <= 1L).cast("long").as("y"))
    for (sf <- Seq("0.001", "0.01", "0.1"); (g, nb) <- Seq((16L, 0L),
        (4L, 0L), (16L, 4096L), (16L, 64L))) {
      val d = aug(graft.core.Tables.load(spark,
        s"/root/testdata/sf$sf", "documents"))
      val m = QualityClassifier.trainLogistic(
        d.filter(pmod(col("doc_id"), lit(2L)) === 0L),
        "doc_id", "text", "y", rounds = 2, gMul = g, nBuckets = nb)
      val test = d.filter(pmod(col("doc_id"), lit(2L)) === 1L)
      val r = QualityClassifier.scoreLogistic(test, m, "doc_id", "text",
          nBuckets = nb)
        .join(test.select(col("doc_id"), col("y")), Seq("doc_id"))
        .agg(count(lit(1)), sum(when(col("pred") === (col("y") === 1L), 1L)
          .otherwise(0L))).head()
      println(f"sf$sf gMul=$g nBuckets=$nb: acc=${r.getLong(1).toDouble / r.getLong(0)}%.4f (${r.getLong(1)}/${r.getLong(0)})")
      graft.ops.CacheScope.release(spark)
    }
    spark.stop()
  }
}
