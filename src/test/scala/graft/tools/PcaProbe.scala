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
      }
    }
    spark.stop()
  }
}
