package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Scratch: ENGINEERED-SKEW probe for the hot-block dispatches (r11
  * verdict ask #6) — the q110/q90/q83 family under the two stress
  * shapes their dials exist for, measured at ×1/×2/×4/×10:
  *
  *  1. **90%-mass label** (embeddings): every replica keeps the SAME
  *     engineered label column in which one label carries 90% of all
  *     vectors, so the hot block grows linearly with the multiple and
  *     its pair space quadratically. Measured both ways:
  *     `exact` (bound lifted — the quadratic baseline, only ×1/×2;
  *     fitted α documents the blow-up) and `dispatched`
  *     (`graft.sim.maxBlock` = 8192: ×1 runs exact under the bound,
  *     ×2+ cross it and take the label-blocked multi-table LSH path —
  *     the 100 TB configuration).
  *
  *  2. **Stopword-heavy block** (documents): every doc gets a 12-token
  *     stopword tail appended BEFORE the per-replica letter rotation,
  *     so each replica contributes its own replica-local stopword set
  *     to one shared `lang` block — the exact regime that killed the
  *     fractional TF-IDF cap in r11 (q123: pair mass 31k → 19.6M at
  *     ×2). `containmentPairs` measured with `maxDfFrac=0.5` (the
  *     fractional cap WEAKENS: tail-token df-fraction is 1/m, so above
  *     ×2 the stopwords re-enter the join) vs `maxDfAbs=500` (the
  *     absolute dial added this round: replica-local stopwords stay
  *     dropped at every multiple).
  *
  * Replica construction is ScaleProbe10's (id shift + bijective letter
  * rotation: within-replica structure preserved, cross-replica keys
  * disjoint, so true pair mass grows linearly and any super-linear
  * wall/shuffle growth is the operator's own).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val mults = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 2, 4, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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

    // rotate letters AND digits, over pre-lowercased text: capitalized
    // or numeric tokens would otherwise survive the rotation unchanged
    // and fabricate cross-replica intersections (first probe run's
    // lesson — 63k phantom containment pairs at x2)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    def rot(r: Int): String =
      (0 until 26).map(i => alpha((i + 7 * r) % 26)).mkString +
        (26 until 36).map(i => alpha(26 + (i - 26 + 3 * r) % 10)).mkString
    val baseDocs = graft.core.Tables.load(spark, sfDir, "documents")
    val baseEmb = graft.core.Tables.load(spark, sfDir, "embeddings")

    // 90%-mass hot label: vec_id mod 10 < 9 -> "hot", else spread
    def skewEmb(mult: Int): DataFrame = (0 until mult).map { r =>
      baseEmb.select(
        (col("vec_id") + lit(r.toLong * 1000000000L)).as("vec_id"),
        col("embedding"),
        when(pmod(col("vec_id"), lit(10L)) < 9, lit("hot"))
          .otherwise(concat(lit("cold_"), col("label"))).as("label"))
    }.reduce(_ unionByName _)

    // stopword-heavy docs: fixed 12-token tail appended pre-rotation,
    // so each replica's tail tokens are REPLICA-LOCAL block stopwords
    val tail = " the of and to a in is it for on as at"
    def skewDocs(mult: Int): DataFrame = (0 until mult).map { r =>
      baseDocs.select(
        (col("doc_id") + lit(r.toLong * 1000000000L)).as("doc_id"),
        translate(lower(concat(col("text"), lit(tail))), alpha, rot(r)).as("text"),
        col("lang"), col("n_chars"))
    }.reduce(_ unionByName _)

    def time(name: String, mult: Int)(df: => DataFrame): Unit = {
      graft.Bench.releaseAll(spark)
      val t0 = System.nanoTime()
      val s0 = shufRecords.get()
      val n = df.count()
      println(f"PROBE $name%-22s x$mult%-2d rows=$n%-9d t=${(System.nanoTime() - t0) / 1e9}%7.2f s shufRec=${shufRecords.get() - s0}%d")
    }

    // warmup
    {
      Similarity.cosinePairsLabelAuto(baseEmb.limit(200), "label", 3000L).count()
      Dedup.containmentPairs(baseDocs.limit(300), "doc_id", "text",
        Seq(col("lang")), 8000L, minSize = 5, maxDfFrac = 0.5).count()
      graft.Bench.releaseAll(spark)
    }

    for (mult <- mults) {
      val ePath = s"/tmp/skew_emb_x$mult"
      val dPath = s"/tmp/skew_docs_x$mult"
      skewEmb(mult).write.mode("overwrite").parquet(ePath)
      skewDocs(mult).write.mode("overwrite").parquet(dPath)
      val e = spark.read.parquet(ePath)
      val d = spark.read.parquet(dPath)
      val hot = e.filter(col("label") === "hot").count()
      println(s"--- x$mult: ${e.count()} vecs (hot=$hot), ${d.count()} docs")

      // quadratic baseline only while affordable (hot^2 pairs)
      if (mult <= 2) {
        spark.conf.set("graft.sim.maxBlock", "100000000")
        time("q90_skew_exact", mult)(
          Similarity.cosinePairsLabelAuto(e, "label", 8000L))
        spark.conf.unset("graft.sim.maxBlock")
      }
      // the 100 TB configuration: hot block crosses the bound at x2+
      spark.conf.set("graft.sim.maxBlock", "8192")
      time("q90_skew_dispatch", mult)(
        Similarity.cosinePairsLabelAuto(e, "label", 8000L))
      time("q110_skew_dispatch", mult)(
        Similarity.semanticDedup(e, "label", 9200L))
      spark.conf.unset("graft.sim.maxBlock")

      // fractional cap (weakens: tail df-fraction is 1/m, under 0.5
      // from x2 on) vs absolute cap (100 < per-replica df 500: the
      // engineered stopwords stay dropped at every multiple)
      time("q83_skew_dffrac", mult)(
        Dedup.containmentPairs(d, "doc_id", "text", Seq(col("lang")),
          8000L, minSize = 5, maxDfFrac = 0.5))
      time("q83_skew_dfabs", mult)(
        Dedup.containmentPairs(d, "doc_id", "text", Seq(col("lang")),
          8000L, minSize = 5, maxDfFrac = 0.5, maxDfAbs = 100L))
    }
    spark.stop()
  }
}
