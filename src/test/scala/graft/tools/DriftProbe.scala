package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scratch: calibrate the q149 drift gate's ceiling/trigger. */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val cents = Similarity.trainCentroids(emb, nCells = 8, iters = 2)
    val cb = Similarity.trainProductQuantizer(emb, nSub = 8, k = 32, iters = 2)
    val idx = Similarity.pqIndex(emb, cents, cb, nSub = 8)
    println("BASE " + Similarity.pqSelfErrorE6(emb, idx, cb).collect().mkString)
    def tryShift(name: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
      val shifted = emb.select(col("vec_id"), f(col("embedding")).as("embedding"))
      val sIdx = Similarity.pqIndex(shifted, cents, cb, nSub = 8)
      println(s"SHIFT $name " + Similarity.pqSelfErrorE6(shifted, sIdx, cb).collect().mkString)
    }
    tryShift("reverse", e => reverse(e))
    tryShift("offset2", e => transform(e, x => (x.cast("double") + lit(2.0)).cast("float")))
    tryShift("square", e => transform(e, x => (x.cast("double") * abs(x.cast("double"))).cast("float")))
    tryShift("halfzero", e => transform(e, (x, i) => when(i < 32, lit(0.0f)).otherwise(x)))
    tryShift("spike", e => transform(e, (x, i) => when(i === 0, lit(10.0f)).otherwise(x)))
    spark.stop()
  }
}
