package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Scratch: 100× density probe for the quadratic-risk dedup family
  * (q31 minhash-LSH, q79 measured auto-dispatch, q83 containment,
  * q110 semantic dedup) — the r12 verdict ask: the 10× probes were
  * green, but LSH background collisions and containment pair mass were
  * historically found exactly by pushing density further.
  *
  * Same replica construction as [[ScaleProbe10]] (id shift + bijective
  * per-replica letter rotation → true pair mass grows LINEARLY; within-
  * replica structure preserved exactly). Embeddings replicate with
  * UNCHANGED labels, so q110's label cells grow with the multiple —
  * the worst case its hot-block dispatch bound exists for; the probe
  * measures the dispatched path (default conf) like production.
  *
  * Reports wall seconds and shuffle records per (operator, multiple);
  * fit α = log(t_100/t_10)/log(10) at the top decade.
  */
object ScaleProbe100 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 10, 30, 100)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // Constant-resources density stress by default (64 partitions at
    // every multiple); override to measure the production dial —
    // shuffle partitions scaling with the corpus restores map-side
    // partial-aggregation effectiveness (the ×30+ saturation below).
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTITIONS", "64")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
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

    // Replica text transform: DICTIONARY substitution onto per-replica
    // fixed-length synthetic vocabularies. Three simpler constructions
    // failed the "true pair mass grows linearly" premise in instructive
    // ways (all measured this round):
    //  - letter ROTATION (the ScaleProbe10 trick) cycles with period 26
    //    → ×30 duplicated replicas verbatim (q31 pairs 7.7k expected,
    //    29.7k observed);
    //  - seeded letter PERMUTATIONS fixed that but the fixture vocab has
    //    1-char words: perm_a(w1) == perm_b(w2) collisions are forced by
    //    pigeonhole beyond 26 replicas, and ONE colliding token (df ≈
    //    every doc, 31-word vocab) joins two whole replicas inside a
    //    (lang, band) block — q79's counting join went 47× shuffle
    //    records for 3× data;
    //  - per-word replica SUFFIXES made tokens disjoint but distorted
    //    the char-5-gram shingle space (every word now shares boundary
    //    grams) — within-replica q31 pair mass exploded 3.5M/replica.
    // The dictionary map sends vocab word i in replica r to a unique
    // random 6-char word u(i,r): every replica's corpus is word-level
    // ISOMORPHIC to every other's (identical pair structure per replica
    // → mass exactly linear), token sets are pairwise disjoint by
    // construction (collision check + deterministic re-draw), and char
    // shingles share only negligible chance grams that the exact verify
    // kills. Replica 0 is ALSO mapped (fixed-length words) so the ×1
    // anchor measures the same corpus shape as every multiple.
    val baseDocs = graft.core.Tables.load(spark, sfDir, "documents")
    val baseEmb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val vocab: Array[String] = baseDocs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .orderBy(col("w")).collect().map(_.getString(0))
    val maxMult = mults.max
    val synth: Array[Array[String]] = {
      val rng = new scala.util.Random(0x51ED270B)
      val seen = scala.collection.mutable.HashSet[String]()
      Array.fill(maxMult) {
        vocab.map { _ =>
          var w = ""
          do { w = Array.fill(6)(('a' + rng.nextInt(26)).toChar).mkString }
          while (!seen.add(w))
          w
        }
      }
    }
    def tagText(r: Int) = {
      val m = map(vocab.zip(synth(r)).flatMap { case (w, u) =>
        Seq(lit(w), lit(u)) }: _*)
      array_join(transform(split(col("text"), " "),
        w => coalesce(element_at(m, w), w)), " ")
    }

    def docCorpus(mult: Int): DataFrame = (0 until mult).map { r =>
      baseDocs.select(
        (col("doc_id") + lit(r.toLong * 1000000000L)).as("doc_id"),
        tagText(r).as("text"),
        col("lang"), col("n_chars"))
    }.reduce(_ unionByName _)

    def embCorpus(mult: Int): DataFrame = (0 until mult).map { r =>
      baseEmb.select(
        (col("vec_id") + lit(r.toLong * 1000000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)

    def time(name: String, mult: Int)(df: => DataFrame): Unit = {
      if (only.exists(!_.contains(name.takeWhile(_ != '_')))) return
      graft.Bench.releaseAll(spark)
      val t0 = System.nanoTime()
      val s0 = shufRecords.get()
      val n = df.count()
      println(f"PROBE $name%-16s x$mult%-3d rows=$n%-10d t=${(System.nanoTime() - t0) / 1e9}%8.2f s shufRec=${shufRecords.get() - s0}%d")
    }

    // warmup (codegen/JIT) so the x1 anchor is honest
    {
      val w = baseDocs.limit(500)
      Dedup.minhashLshPairs(w, "doc_id", "text", 5, 32, 8, 0.5).count()
      Dedup.ngramJaccardPairsAuto(w, "doc_id", "text", Seq(col("lang")), 8000L).count()
      Dedup.containmentPairs(w, "doc_id", "text", Seq(col("lang")), 9000L,
        minSize = 30).count()
      Similarity.semanticDedup(baseEmb.limit(500), "label", 3000L).count()
      graft.Bench.releaseAll(spark)
    }

    for (mult <- mults) {
      val dPath = s"/tmp/scale100_docs_x$mult"
      val ePath = s"/tmp/scale100_emb_x$mult"
      docCorpus(mult).repartition(64).write.mode("overwrite").parquet(dPath)
      embCorpus(mult).repartition(64).write.mode("overwrite").parquet(ePath)
      val d = spark.read.parquet(dPath)
      val e = spark.read.parquet(ePath)
      println(s"--- x$mult: ${d.count()} docs, ${e.count()} vecs")
      val blocks = Seq(col("lang"), floor(col("n_chars") / 100).cast("long"))
      time("q31_minhash", mult)(
        Dedup.minhashLshPairs(d, "doc_id", "text", 5, 32, 8, 0.5))
      time("q79_auto", mult)(
        Dedup.ngramJaccardPairsAuto(d, "doc_id", "text", blocks, 8000L))
      time("q83_containment", mult)(
        Dedup.containmentPairs(d, "doc_id", "text", Seq(col("lang")), 9000L,
          minSize = 30))
      time("q110_semdedup", mult)(
        Similarity.semanticDedup(e, "label", 3000L))
      // r15 newcomers at density: PageRank (per-round |V| + combined
      // |E|→|V| shuffles — the iteration family's 100× check), integer
      // k-means (assignment map-only, update partials partition-
      // bounded — wall should stay FLAT), and the crawl pipeline
      // (linear by construction; file count scales with the corpus per
      // the deployment contract)
      val didC = col("doc_id")
      time("q158_pagerank", mult) {
        val nDf = d.agg(count(lit(1)).as("n"))
        val edges = d.crossJoin(broadcast(nDf))
          .select(col("doc_id"), col("n"),
            explode(sequence(lit(1L), lit(1L) + pmod(col("doc_id"), lit(3L))))
              .as("k"))
          .select(col("doc_id").as("src"),
            pmod(col("doc_id") * 31L + col("k") * 17L, col("n")).as("dst"))
        graft.ops.Graph.pageRank(edges, "src", "dst", iters = 3)
      }
      time("q164_kmeans", mult)(
        graft.ops.Kmeans.assignInt(e, "vec_id", "embedding", k = 8, iters = 2))
      val urlC = concat(lit("HTTPS://WWW.crawl"),
        pmod(didC, lit(5L)).cast("string"),
        lit(".Example.org/p/"), didC.cast("string"),
        lit("?utm_source=probe&id="), pmod(didC, lit(7L)).cast("string"),
        lit("#f"))
      val htmlC = concat(lit("<html><head><title>T "), didC.cast("string"),
        lit("</title></head><body><div>nav | home</div><p>"),
        substring(col("text"), 1, 200),
        lit("</p><a href=\"/l\">x</a></body></html>"))
      time("q159_crawl", mult) {
        val parsed = graft.ops.Warc.parseRecords(
          graft.ops.Warc.asWarcFiles(d, pmod(didC, lit(8L * mult)), didC,
            graft.ops.Warc.recordString(
              concat(lit("<urn:uuid:"), didC.cast("string"), lit(">")),
              urlC, htmlC)))
        val ex = parsed.select(
          regexp_extract(col("record_id"), "<urn:uuid:([0-9]+)>", 1)
            .cast("long").as("doc_id"),
          graft.ops.Url.normalizeUrl(col("target_uri")).as("url_norm"),
          graft.ops.Html.extractText(col("payload_text")).as("body"))
        ex.groupBy(col("url_norm"))
          .agg(min(struct(col("doc_id"), col("body"))).as("w"))
          .filter(length(col("w.body")) >= 50)
      }
    }
    spark.stop()
  }
}
