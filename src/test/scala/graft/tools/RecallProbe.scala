package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scratch: measure LSH ANN recall@k vs brute force on an sf dir. */
object RecallProbe {
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
    for (p <- Seq(2, 4, 6)) {
      val r = recall(Similarity.lshTopK(q, emb, k, nPlanes = p))
      println(f"lshTopK nPlanes=$p recall=$r%.3f")
    }
    for (p <- Seq(2, 4, 6); t <- Seq(4, 8, 16, 32)) {
      val r = recall(Similarity.lshTopKMulti(q, emb, k, nPlanes = p, nTables = t))
      println(f"lshTopKMulti nPlanes=$p nTables=$t recall=$r%.3f")
    }
    spark.stop()
  }
}
