package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Pca

/** Scratch: calibrate the q156 PCA gate's floors (variance explained
  * at k=16 on the synthetic embeddings, recon-vs-spectrum agreement,
  * trace consistency) at both gate SFs.
  */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = graft.core.Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      for (k <- Seq(8, 16, 32)) {
        val m = Pca.fit(emb, "embedding", k)
        val mse = emb.select(
          Pca.reconstructionSqErr(col("embedding"),
            Pca.project(col("embedding"), m), m).as("e"))
          .agg(avg(col("e"))).head().getDouble(0) / m.d
        val ve = 1.0 - mse * m.d / m.trace
        println(f"$sf k=$k n=${m.n} trace=${m.trace}%.4f predMse=${m.predictedMse}%.6f " +
          f"measMse=$mse%.6f |diff|=${math.abs(mse - m.predictedMse)}%.2e ve=$ve%.4f " +
          f"top1=${m.eigenvalues.head}%.4f ev16=${m.eigenvalues(15)}%.4f ev63=${m.eigenvalues.last}%.4f")
        // ANN recall through the reduced space (q157 calibration)
        val reduced = emb.select(col("vec_id"),
          transform(Pca.project(col("embedding"), m, center = false),
            y => y.cast("float")).as("embedding"))
        val truth = graft.ops.Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 8), emb, 5)
        val got = graft.ops.Similarity.bruteForceTopK(
          reduced.filter(col("vec_id") < 8), reduced, 5)
        val hits = truth.join(got, Seq("query_id", "neighbor_id"), "left_semi").count()
        val total = truth.count()
        println(f"$sf k=$k ann recall@5 = ${hits.toDouble / total}%.3f ($hits/$total)")
      }
    }
    spark.stop()
  }
}
