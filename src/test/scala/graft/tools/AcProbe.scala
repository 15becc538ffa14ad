package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pattern-count probe for [[graft.ops.Decontaminate.multiPatternHits]]
  * — the Aho–Corasick contract: scan cost is O(|text|) per document
  * REGARDLESS of pattern count, so growing the dictionary 6 → 600
  * patterns must leave wall ~flat, while the naive N × `contains`
  * chain (what the operator replaces) grows linearly in N. Both run
  * over the same corpus; the probe prints both so SCALE.md records
  * the crossover, not a claim.
  *
  *   Test/runMain graft.tools.AcProbe /root/testdata/sf0.1
  */
object AcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val nDocs = docs.count()
    // dictionary synthesis — the decontamination shape: a large,
    // almost-entirely-ABSENT dictionary (canary strings against a
    // clean corpus) plus two attested phrases. Absent patterns are
    // what separates the approaches: with no hit to early-exit on,
    // the naive gate pays one contains scan PER PATTERN per doc, the
    // automaton still pays one text pass total.
    val vocab = Seq("batch", "data", "scan", "order", "merge", "filter",
      "window", "stream", "spark", "hash", "join", "table")
    def dict(k: Int): Seq[String] =
      Seq("batch batch", "order scan") ++ (2 until k).map { i =>
        s"${vocab(i % vocab.size)} ${vocab((i / vocab.size) % vocab.size)}#$i"
      }
    for (k <- Seq(6, 60, 600, 6000)) {
      val pats = dict(k)
      def timed(body: => Long): Double = {
        body // warm once (codegen compile), then time
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      val tHits = timed(graft.ops.Decontaminate
        .multiPatternHits(docs, "doc_id", "text", pats).count())
      val tGate = timed(graft.ops.Decontaminate
        .multiPatternFilter(docs, "text", pats).count())
      // the naive gate: per row, per pattern, one contains — flat
      // higher-order exists (a reduce(+) chain of 600 Adds overflows
      // the converter stack; exists also early-exits, matching the
      // AC gate's fast path, so this is the FAIR baseline)
      val patArr = array(pats.map(lit): _*)
      val tNaive = timed(docs
        .filter(exists(patArr, p => col("text").contains(p))).count())
      println(f"ACPROBE docs=$nDocs patterns=$k%-5d acHits=$tHits%6.2f s " +
        f"acGate=$tGate%6.2f s naiveExistsGate=$tNaive%6.2f s")
    }
    spark.stop()
  }
}
