package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scratch: measure the six probabilistic-query gates (recall vs exact
  * baseline / HLL error) at an sf dir, to calibrate the q94-q99
  * oracle-gated floors.
  */
object GateProbe {
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
    val truth = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    println(f"q33 lshTopK(4): ${recall(Similarity.lshTopK(q, emb, 5, nPlanes = 4))}%.4f")

    // q94 (r16): single-table LSH on the PLANTED 16-cluster synthesis
    // (the in-query structure the gate actually measures)
    {
      val vid = col("vec_id")
      val structured = emb.select(vid,
        transform(sequence(lit(0), lit(63)), i => {
          val c = pmod(vid, lit(16L))
          val center = (pmod(c * 31L + i.cast("long") * 17L +
            c * i.cast("long") * 7L, lit(19L)).cast("double") - 9.0) / 9.0
          val eps = (pmod(vid * 7L + i.cast("long") * 3L, lit(11L))
            .cast("double") - 5.0) / 5.0 * 0.05
          (center + eps).cast("float")
        }).as("embedding")).persist()
      val sq = structured.filter(col("vec_id") < 8)
      val struthRows = Similarity.bruteForceTopK(sq, structured, 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sgot = Similarity.lshTopK(sq, structured, 5, nPlanes = 4)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"q94 lshTopK(4) on planted clusters: ${struthRows.intersect(sgot).size.toDouble / struthRows.size}%.4f")
      structured.unpersist()
    }
    println(f"q54 lshTopKMulti(4,16): ${recall(Similarity.lshTopKMulti(q, emb, 5, nPlanes = 4, nTables = 16))}%.4f")
    println(f"q36 ivfTopK(8): ${recall(Similarity.ivfTopK(q, emb, 5, nCells = 8))}%.4f")

    // q96 (r17): untrained IVF on the SAME planted 16-cluster
    // synthesis — sign-sum cells put a tight cluster in one cell, so
    // recall measures bucketing correctness, not iid bad luck
    {
      val vid = col("vec_id")
      val structured = emb.select(vid,
        transform(sequence(lit(0), lit(63)), i => {
          val c = pmod(vid, lit(16L))
          val center = (pmod(c * 31L + i.cast("long") * 17L +
            c * i.cast("long") * 7L, lit(19L)).cast("double") - 9.0) / 9.0
          val eps = (pmod(vid * 7L + i.cast("long") * 3L, lit(11L))
            .cast("double") - 5.0) / 5.0 * 0.05
          (center + eps).cast("float")
        }).as("embedding")).persist()
      val sq = structured.filter(col("vec_id") < 8)
      val struthRows = Similarity.bruteForceTopK(sq, structured, 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sgot = Similarity.ivfTopK(sq, structured, 5, nCells = 8)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"q96 ivfTopK(8) on planted clusters: ${struthRows.intersect(sgot).size.toDouble / struthRows.size}%.4f")
      structured.unpersist()
    }
    val cents = Similarity.trainCentroids(emb, nCells = 8, iters = 2)
    println(f"q58 ivfTopKTrained(probe2): ${recall(Similarity.ivfTopKTrained(q, emb, 5, cents, nProbe = 2))}%.4f")

    // q35: pair recall vs the exact within-label baseline (q90's output,
    // the ONE shared definition)
    val exactPairs = Similarity.cosinePairsLabelExact(emb, "label", 3000L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = Similarity.cosineNearDupPairsMulti(emb, minSimE4 = 3000L,
        nPlanes = 8, nTables = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pr = exactPairs.intersect(lshPairs).size.toDouble / math.max(exactPairs.size, 1)
    println(f"q35 pair recall vs within-label exact: $pr%.4f (truth ${exactPairs.size})")

    // q98 r18 planted edition: pair recall on the 16-cluster synthesis
    // at production similarity (cos >= 0.85) — the high-recall regime
    {
      val vid = col("vec_id")
      val structured = emb.select(vid,
        transform(sequence(lit(0), lit(63)), i => {
          val c = pmod(vid, lit(16L))
          val center = (pmod(c * 31L + i.cast("long") * 17L +
            c * i.cast("long") * 7L, lit(19L)).cast("double") - 9.0) / 9.0
          val eps = (pmod(vid * 7L + i.cast("long") * 3L, lit(11L))
            .cast("double") - 5.0) / 5.0 * 0.05
          (center + eps).cast("float")
        }).as("embedding"),
        pmod(vid, lit(16L)).cast("int").as("label")).persist()
      val truthP = Similarity.cosinePairsLabelExact(structured, "label", 8500L)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val gotP = Similarity.cosineNearDupPairsMulti(structured,
          minSimE4 = 8500L, nPlanes = 8, nTables = 8)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"q98 planted pair recall @8500: ${truthP.intersect(gotP).size.toDouble / math.max(truthP.size, 1)}%.4f (truth ${truthP.size})")
      structured.unpersist()
    }

    // q90's over-bound dispatch: label-blocked LSH with threshold-
    // adaptive planes vs the same exact truth
    spark.conf.set("graft.sim.maxBlock", "2")
    val dispatched = Similarity.cosinePairsLabelAuto(emb, "label", 3000L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.unset("graft.sim.maxBlock")
    val dr = exactPairs.intersect(dispatched).size.toDouble / math.max(exactPairs.size, 1)
    println(f"q90 dispatched-path recall vs exact: $dr%.4f")

    // q48: HLL per-day relative error vs exact distinct
    val ev = graft.core.Tables.load(spark, sfDir, "events")
    val errs = ev.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("a"),
        countDistinct(col("user_id")).as("x"))
      .select((abs(col("a") - col("x")) * 10000.0 / col("x")).as("err_e4"))
      .collect().map(_.getDouble(0))
    println(f"q48 HLL err_e4: max ${errs.max}%.1f over ${errs.length} days")
    spark.stop()
  }
}
