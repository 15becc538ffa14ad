package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.ops.Similarity

/** Scratch: 100× density probe for the VECTOR family (r13 verdict ask
  * #5) — ScaleProbe100 covered text dedup; this measures the ANN side:
  * IVF-PQ index build (encode) wall, query wall AND recall, and
  * semantic-dedup drop recall, at controlled duplicate-cluster
  * densities ×1/×10/×30/×100 of the sf0.1 embeddings (2 000 base
  * vectors → 200 000 at the top).
  *
  * Corpus construction — PERTURBED duplicate clusters, cluster size =
  * the multiple: replica r of base vector v adds 0.08·‖v‖ to ONE
  * replica-specific dimension ((r·7) mod 64). Consequences, all by
  * construction:
  *  - cos(original, copy) ≈ 0.9968 and cos(copy_r, copy_q) ≈ 0.9937 —
  *    every same-base pair clears a τ = 0.99 near-dup floor, and the
  *    copies are NOT exact duplicates, so semanticDedup's exact-dup
  *    collapse cannot shortcut the pair machinery (the thing under
  *    test);
  *  - cross-base similarity is untouched (the base corpus has no
  *    0.99-pairs — asserted at ×1), so the TRUE dominated set is
  *    analytic: every copy except each cluster's min id →
  *    2000·(mult−1); measured drops / truth = drop recall;
  *  - the ANN truth shifts with density exactly like a real ingest:
  *    a replica-0 query's true top-5 becomes its own cluster's copies
  *    (cos ≈ 0.997) crowding out the base neighbors — the ADC
  *    shortlist must rank 0.997-copies above 0.99-noise through 8×32
  *    quantization, which is the regime where the refine re-rank
  *    earns its keep (the q146 ADC-invert lesson, now vs density).
  *
  * Models (coarse centroids + PQ codebooks) are trained ONCE on the
  * ×1 base corpus and FROZEN across multiples — the q148 doctrine: a
  * production pipeline encodes deltas against nightly models, so the
  * probe prices encode+query (recurring) against stale-model recall
  * (the drift question; the dial sweep at the top multiple records
  * what nProbe/refine buy back).
  *
  * semanticDedup runs with `graft.sim.maxBlock` forced DOWN (4096) so
  * the label blocks cross the dispatch bound and the probe measures
  * the label-blocked LSH path (at the default 65536 bound even ×100's
  * ~20k-per-label blocks would take the quadratic exact branch —
  * 4·10⁸ pairs/label, the infeasible regime the dispatch exists for).
  */
object VectorScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 10, 30, 100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTITIONS", "64"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.sim.maxBlock", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufRecords = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shufRecords.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
        ()
      }
    })

    val baseEmb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val baseN = baseEmb.count()

    def corpus(mult: Int): DataFrame = (0 until mult).map { r =>
      val pd = (r * 7) % 64
      baseEmb.select(
        (col("vec_id") + lit(r.toLong * 1000000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === lit(pd),
            (x.cast("double") + lit(0.08) *
              sqrt(VectorFunctions.dot(col("embedding"), col("embedding"))))
              .cast("float"))
            .otherwise(x)).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

    def timed[A](f: => A): (A, Double, Long) = {
      graft.Bench.releaseAll(spark)
      val t0 = System.nanoTime(); val s0 = shufRecords.get()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9, shufRecords.get() - s0)
    }

    // frozen models off the base corpus (the nightly artifact)
    val cents = Similarity.trainCentroids(baseEmb, nCells = 8, iters = 2)
      .collect()
    val books = Similarity.trainProductQuantizer(baseEmb, nSub = 8, k = 32, iters = 2)
      .collect()
    val centsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(cents.toSeq),
      Similarity.trainCentroids(baseEmb, 8, 0).schema)
    val booksDf = spark.createDataFrame(
      spark.sparkContext.parallelize(books.toSeq),
      Similarity.trainProductQuantizer(baseEmb, 8, 32, 0).schema)
    graft.Bench.releaseAll(spark)

    // sanity: the base corpus has no 0.99-pairs, so the dedup truth is
    // exactly clusterSize-1 drops per base vector
    val basePairs = Similarity.cosinePairsLabelExact(baseEmb, "label", 9900L).count()
    println(s"SANITY base 0.99-pairs = $basePairs (must be 0 for analytic truth)")

    for (mult <- mults) {
      val path = s"/tmp/vscale_emb_x$mult"
      corpus(mult).repartition(64).write.mode("overwrite").parquet(path)
      val e = spark.read.parquet(path)
      val n = e.count()
      println(s"--- x$mult: $n vectors")
      val q = e.filter(col("vec_id") < 8)

      // truth: exact top-5 at THIS density
      val truth = Similarity.bruteForceTopK(q, e, 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // index build (encode against frozen models): the recurring
      // ingest cost
      val (idx, tIdx, sIdx) = timed {
        val i = Similarity.pqIndex(e, centsDf, booksDf, nSub = 8)
        i.write.mode("overwrite").parquet(s"/tmp/vscale_idx_x$mult")
        spark.read.parquet(s"/tmp/vscale_idx_x$mult")
      }
      println(f"PROBE pq_index      x$mult%-3d rows=${idx.count()}%-9d t=$tIdx%8.2f s shufRec=$sIdx%d")

      def recallOf(df: DataFrame): Double = {
        val got = df.select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        truth.intersect(got).size.toDouble / math.max(1, truth.size)
      }
      // gated defaults
      val (r0, tQ, sQ) = timed(recallOf(
        Similarity.ivfPqTopK(q, idx, e, 5, centsDf, booksDf, nProbe = 2, refine = 8)))
      println(f"PROBE ivfpq_query   x$mult%-3d nProbe=2 refine=8  recall=$r0%.3f t=$tQ%8.2f s shufRec=$sQ%d")
      // dial sweep at the top multiples: what nProbe/refine buy back
      if (mult >= 30) {
        for ((np, rf) <- Seq((4, 8), (2, 16), (4, 16))) {
          val (r1, t1, _) = timed(recallOf(
            Similarity.ivfPqTopK(q, idx, e, 5, centsDf, booksDf, nProbe = np, refine = rf)))
          println(f"PROBE ivfpq_dial    x$mult%-3d nProbe=$np refine=$rf recall=$r1%.3f t=$t1%8.2f s")
        }
      }

      // semantic dedup at τ=0.99: analytic truth = baseN·(mult-1) drops
      val (survivors, tS, sS) = timed(
        Similarity.semanticDedup(e, "label", 9900L).count())
      val drops = n - survivors
      val truthDrops = baseN * (mult - 1)
      val dropRecall =
        if (truthDrops == 0) 1.0 else drops.toDouble / truthDrops
      println(f"PROBE semdedup_0.99 x$mult%-3d drops=$drops%-9d truth=$truthDrops%-9d recall=$dropRecall%.4f t=$tS%8.2f s shufRec=$sS%d")
    }
    spark.stop()
  }
}
