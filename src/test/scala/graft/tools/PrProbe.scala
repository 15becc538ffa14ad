package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-PageRank round probe: measures the rounds a
  * source-additive warm start saves vs the cold rebuild as the DELTA
  * SHRINKS relative to the standing graph — the scale argument for
  * [[graft.ops.Graph.pageRankIncremental]] (each round is one full
  * edge scan; rounds ARE the wall-clock at 10¹¹ edges). Run at sf0.01
  * and sf0.1; results recorded in SCALE.md.
  *
  *   Test/runMain graft.tools.PrProbe /root/testdata/sf0.01
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val n = docs.agg(count(lit(1)).as("n"))
    val edges = docs.crossJoin(broadcast(n))
      .select(col("doc_id"), col("n"),
        explode(sequence(lit(1L), lit(1L) + pmod(col("doc_id"), lit(3L)))).as("k"))
      .select(col("doc_id").as("src"),
        pmod(col("doc_id") * 31L + col("k") * 17L, col("n")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint(true)
    // production-grade precision for the probe: e8 scale, d=0.85 —
    // the regime where warm-start savings actually matter
    val (d, scale) = (85L, 100000000L)
    val cold = graft.ops.Graph.pageRankFixpoint(edges, "src", "dst",
      maxIters = 1000, dampingE2 = d, scaleUnit = scale)
    // collect once: CacheScope.release drops the checkpoint blocks
    // backing the score frames — released frames must not be re-read
    val coldMap = cold.scores.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.ops.CacheScope.release(spark)
    println(s"PRPROBE sf=$sfDir cold rounds=${cold.rounds} converged=${cold.converged}")
    for (mod <- Seq(8L, 32L, 128L)) {
      val standing = edges.filter(pmod(col("src"), lit(mod)) =!= 0L)
      val delta = edges.filter(pmod(col("src"), lit(mod)) === 0L)
      val old = graft.ops.Graph.pageRankFixpoint(standing, "src", "dst",
        maxIters = 1000, dampingE2 = d, scaleUnit = scale)
      val warm = graft.ops.Graph.pageRankIncremental(old.scores, standing,
        delta, "src", "dst", maxIters = 1000, dampingE2 = d, scaleUnit = scale)
      val warmMap = warm.scores.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      println(s"PRPROBE delta=1/$mod standing_rounds=${old.rounds} " +
        s"warm_rounds=${warm.rounds} cold_rounds=${cold.rounds} " +
        s"warm_equals_cold=${warmMap == coldMap}")
      graft.ops.CacheScope.release(spark)
    }
    spark.stop()
  }
}
