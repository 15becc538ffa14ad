package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Decontaminate, Dedup}

/** Scratch: scaling curves for the r8 operators — run each on ×1/×2/×4
  * corpus multiples (id-shifted unions, texts perturbed per replica so
  * replicas do not collapse into exact dups) and report wall time and
  * output rows. The question each answers at 100 TB: is cost linear in
  * corpus size (map-side dominated), or does the pair term bite?
  *
  *  - sharedWindowPairs: candidate join is quadratic per shared
  *    fingerprint — replica perturbation keeps window sets disjoint
  *    across replicas, so pairs (and cost) should grow ~linearly.
  *  - containmentPairs: Σf² counting join within (lang) blocks —
  *    f doubles per replica step on the shared vocabulary, so THIS one
  *    is expected super-linear unless blocks split; measuring it is the
  *    point (the doc says "pre-filter stopwords upstream at scale").
  *  - Decontaminate.antiJoin: bloom phase is map-side; expect linear.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.core.Tables.load(spark, sfDir, "documents")
    val n0 = base.count()

    // replica r: ids shifted by r*10^9; text salted with a replica tag
    // INSIDE the window stream (prefix) so cross-replica windows/tokens
    // differ while within-replica near-dup structure is preserved
    def corpus(mult: Int): DataFrame = (0 until mult).map { r =>
      base.select(
        (col("doc_id") + lit(r.toLong * 1000000000L)).as("doc_id"),
        concat(lit(s"rep$r "), col("text")).as("text"),
        col("lang"),
        col("n_chars"))
    }.reduce(_ unionByName _)

    def time(name: String, df: => DataFrame): Unit = {
      graft.Bench.releaseAll(spark)
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (mult <- Seq(1, 2, 4)) {
      val path = s"/tmp/scale_probe_x$mult"
      corpus(mult).write.mode("overwrite").parquet(path)
      val c = spark.read.parquet(path)
      println(s"--- x$mult: ${c.count()} docs (base $n0)")
      time(f"sharedWindows  x$mult",
        Dedup.sharedWindowPairs(c, "doc_id", "text", k = 40, stride = 4))
      time(f"containment    x$mult",
        Dedup.containmentPairs(c, "doc_id", "text", Seq(col("lang")), 9000L, minSize = 30))
      time(f"bloomAntiJoin  x$mult",
        Decontaminate.antiJoin(c, col("text"),
          c.filter(col("doc_id") % 7 === 0), col("text")))
    }
    spark.stop()
  }
}
