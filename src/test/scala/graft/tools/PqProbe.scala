package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scratch: measure IVF-PQ recall@k vs brute force to calibrate the
  * q146 floor (the q94-pattern gate needs a measured margin, not a
  * guessed constant).
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
    val k = 5
    val truth = Similarity.bruteForceTopK(q, emb, k)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    for (nSub <- Seq(4, 8); kc <- Seq(16, 32); nProbe <- Seq(2, 4)) {
      val cents = Similarity.trainCentroids(emb, nCells = 8, iters = 2)
      val cb = Similarity.trainProductQuantizer(emb, nSub = nSub, k = kc, iters = 2)
      val idx = Similarity.pqIndex(emb, cents, cb, nSub)
      val r = recall(Similarity.ivfPqTopK(q, idx, emb, k, cents, cb, nProbe, refine = 8))
      println(f"ivfPqTopK nSub=$nSub k=$kc nProbe=$nProbe recall=$r%.3f")
      graft.ops.CacheScope.release(spark)
    }
    spark.stop()
  }
}
