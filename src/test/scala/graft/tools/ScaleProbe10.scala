package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Scratch: 10× scaling probe for the dedup + ANN families
  * (q30/q31/q56/q57/q80/q90 cores) — corpus multiples ×1/×2/×4/×10 of
  * sf0.1, wall time AND shuffle records per run, exponent fitted as
  * log(t_m/t_1)/log(m) at the largest multiple.
  *
  * Replica construction: ids shift by r·10⁹; text goes through a
  * PER-REPLICA bijective letter rotation (translate over a-z), so
  *  - WITHIN a replica the near-dup/cluster structure of the corpus is
  *    preserved exactly (a bijection on characters preserves token and
  *    shingle equality), and
  *  - ACROSS replicas tokens/shingles/windows land in different join
  *    keys (rotated strings), so true pair mass grows LINEARLY with
  *    the multiple — the regime where a linear-cost operator shows a
  *    ~1.0 exponent and a Σf²/quadratic term shows itself honestly.
  * Embeddings replicate with shifted vec_ids and UNCHANGED labels —
  * label blocks grow with the multiple, which is exactly the stress
  * the q90 dispatch (graft.sim.maxBlock) exists for; the probe runs
  * the auto dispatcher at the default bound (exact path) and at a
  * lowered bound (LSH path) to measure both branches' scaling.
  */
object ScaleProbe10 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 2, 4, 10)
    // optional 3rd arg: comma-set of probe names to run (re-measure one
    // operator without paying the full sweep)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
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

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(r: Int): String = alpha.indices.map(i => alpha((i + 7 * r) % 26)).mkString
    val baseDocs = graft.core.Tables.load(spark, sfDir, "documents")
    val baseEmb = graft.core.Tables.load(spark, sfDir, "embeddings")

    def docCorpus(mult: Int): DataFrame = (0 until mult).map { r =>
      baseDocs.select(
        (col("doc_id") + lit(r.toLong * 1000000000L)).as("doc_id"),
        translate(col("text"), alpha, rot(r)).as("text"),
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
      println(f"PROBE $name%-16s x$mult%-2d rows=$n%-9d t=${(System.nanoTime() - t0) / 1e9}%7.2f s shufRec=${shufRecords.get() - s0}%d")
    }

    // JVM/codegen warmup so the x1 anchor is not inflated by first-run
    // compilation (observed: q30 x1 slower than x2 without this)
    {
      val w = baseDocs.limit(500)
      Dedup.ngramJaccardPairs(w, "doc_id", "text",
        Seq(col("lang")), 8000L).count()
      Dedup.ngramJaccardPairsPrefix(w, "doc_id", "text",
        Seq(col("lang")), 8000L).count()
      Dedup.minhashLshPairs(w, "doc_id", "text", 5, 32, 8, 0.5).count()
      Dedup.sharedWindowPairs(w, "doc_id", "text", 40, 4).count()
      Similarity.cosinePairsLabelAuto(baseEmb.limit(200), "label", 3000L).count()
      graft.Bench.releaseAll(spark)
    }

    for (mult <- mults) {
      val dPath = s"/tmp/scale10_docs_x$mult"
      val ePath = s"/tmp/scale10_emb_x$mult"
      docCorpus(mult).write.mode("overwrite").parquet(dPath)
      embCorpus(mult).write.mode("overwrite").parquet(ePath)
      val d = spark.read.parquet(dPath)
      val e = spark.read.parquet(ePath)
      println(s"--- x$mult: ${d.count()} docs, ${e.count()} vecs")
      val blocks = Seq(col("lang"), floor(col("n_chars") / 100).cast("long"))
      time("q30_ngram", mult)(
        Dedup.ngramJaccardPairs(d, "doc_id", "text", blocks, 8000L))
      time("q56_prefix", mult)(
        Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text", blocks, 8000L))
      time("q31_minhash", mult)(
        Dedup.minhashLshPairs(d, "doc_id", "text", 5, 32, 8, 0.5))
      // q57 core: index of the even half built OFF the timed path (the
      // nightly-artifact contract), odd half deduped against it
      val corpusHalf = d.filter(col("doc_id") % 2 === 0)
      val freshHalf = d.filter(col("doc_id") % 2 === 1)
      val idxPath = s"/tmp/scale10_idx_x$mult"
      Dedup.buildMinhashIndex(corpusHalf, "doc_id", "text", 5, 32)
        .write.mode("overwrite").parquet(idxPath)
      time("q57_incremental", mult)(
        Dedup.minhashLshIncremental(freshHalf, corpusHalf,
          spark.read.parquet(idxPath), "doc_id", "text", 5, 32, 8, 0.5))
      time("q80_sharedwin", mult)(
        Dedup.sharedWindowPairs(d, "doc_id", "text", k = 40, stride = 4))
      // q90 exact branch (label blocks grow with mult — quadratic by
      // construction; the dispatch bound is the 100 TB answer)
      time("q90_exact", mult)(
        Similarity.cosinePairsLabelAuto(e, "label", 3000L))
      // q90 dispatched branch: lower the bound so the SAME data takes
      // the LSH path
      spark.conf.set("graft.sim.maxBlock", "100")
      time("q90_lsh", mult)(
        Similarity.cosinePairsLabelAuto(e, "label", 3000L))
      spark.conf.unset("graft.sim.maxBlock")
      // r10 additions — the three new join/agg-bound operators; all
      // are expected ~linear (the budget stays FIXED as the corpus
      // grows for q109, which is the realistic regime: the boundary
      // window's share shrinks as 1/mult)
      time("q109_tokbudget", mult)(
        graft.ops.Sampling.tokenBudgetSample(
          d.select(col("doc_id"), col("lang"), col("n_chars")),
          Seq("lang"), "doc_id", "n_chars", budget = 120000L, nBuckets = 1024))
      // q113: reference stays the x1 slice (a model does not grow with
      // the corpus being scored) — scoring cost should track positions
      time("q113_lmscore", mult)(
        graft.ops.LmScore.bigramScore(
          d.filter(col("doc_id") % 10 =!= 0),
          d.filter(col("doc_id") % 10 === 0 && col("doc_id") < 1000000000L),
          "doc_id", "text"))
      // the length() filter references clean_text (derived from the
      // kill-list side), or else a bare count() lets Catalyst ELIMINATE
      // the distinct-keyed left join and the whole rebuild with it —
      // the q114 first probe run measured exactly that nothing
      time("q114_paradedup", mult)(
        graft.ops.SpanScrub.dedupParagraphs(
          d.select(col("doc_id"),
            concat_ws("\n\n", substring(col("text"), 1, 120),
              substring(col("text"), 121, 120),
              substring(col("text"), 241, 120)).as("text")),
          "doc_id", "text")
          .filter(length(col("clean_text")) >= 0))
      // r11 additions. q115: labels unchanged across replicas → cells
      // grow ×mult; centroid agg is linear, the per-cell rank is the
      // n·log(cell) term. q116: the per-replica letter rotation gives
      // each replica its own word dictionary → dictionary (and block)
      // mass grows ~linearly. q117: same dictionary growth; 4 merge
      // rounds of dictionary-sized aggregates.
      time("q115_prototype", mult)(
        Similarity.prototypicality(e, "vec_id", "label", "embedding", 10))
      val wordDict = d.select(explode(
        graft.functions.TextFunctions.tokenize(lower(col("text")))).as("w"))
      time("q116_fuzzydict", mult)(
        graft.ops.FuzzyJoin.dictionaryPairs(wordDict, "w", maxDist = 1,
          v => substring(v, 1, 3)))
      time("q117_bpe", mult)(
        graft.ops.BpeTrain.learnMerges(d, "text", nMerges = 4))
      // r11 second batch. q123: the df cap bounds per-term candidate
      // mass, replicas keep disjoint vocabularies → pair mass linear.
      // q120: one wide aggregate, Expand×(distinct cols). q122/q124 run
      // on the events table — replicate it inline with shifted ids and
      // users (cross-replica users disjoint → per-key state constant).
      // frac-only cap: measured blowup at x2+ (the cap grows with N and
      // admits replica-local stopwords — df² pair mass). Probe the
      // OPERATED form: absolute cap pinned at the x1 bound, the dial a
      // 100 TB deployment sets.
      time("q123_tfidf", mult)(
        graft.ops.Retrieval.tfidfCosinePairs(d, "doc_id", "text", 5000L,
          maxDfAbs = 2500L))
      time("q120_profile", mult)(
        graft.ops.Profile.summarize(d.select(col("doc_id"), col("lang"), col("n_chars"))))
      val baseEv = graft.core.Tables.load(spark, sfDir, "events")
      val ev = (0 until mult).map { r =>
        baseEv.select((col("event_id") + lit(r.toLong * 1000000000L)).as("event_id"),
          col("ts"), (col("user_id") + lit(r.toLong * 1000000000L)).as("user_id"),
          col("value"))
      }.reduce(_ unionByName _)
      time("q122_sessionize", mult)(
        graft.ops.Sessionize.assignSessions(ev, "user_id", "ts", "event_id", 1800L))
      time("q124_trailing", mult)(
        graft.ops.TimeFeatures.trailingStats(ev, "user_id", "ts", "value", 3600L))
      // r14 additions (r15 verdict ask #6): the crawl/link/PCA family.
      // q153/q154 are narrow codegen'd projections — the filter
      // references every output so Catalyst cannot prune the extraction
      // (the q114 probe trap).
      val didC = col("doc_id")
      val urlC = concat(lit("HTTPS://WWW.crawl"),
        pmod(didC, lit(5L)).cast("string"),
        lit(".Example.org/p/"), didC.cast("string"),
        lit("?utm_source=probe&id="), pmod(didC, lit(7L)).cast("string"),
        lit("#f"))
      val htmlC = concat(lit("<html><head><title>T "), didC.cast("string"),
        lit("</title></head><body><div>nav | home</div><p>"),
        substring(col("text"), 1, 200),
        lit("</p><a href=\"/l\">x</a></body></html>"))
      time("q153_htmlextract", mult)(
        d.select(graft.ops.Html.extractText(htmlC).as("t"),
            graft.ops.Html.extractTitle(htmlC).as("ti"),
            graft.ops.Html.linkDensityE6(htmlC).as("ld"))
          .filter(length(col("t")) + length(col("ti")) + col("ld") >= 0))
      time("q154_urlnorm", mult)(
        d.select(graft.ops.Url.normalizeUrl(urlC).as("u"),
            graft.ops.Url.host(urlC).as("h"))
          .filter(length(col("u")) + length(col("h")) >= 1))
      // q155: blob build (groupBy file_id concat) + byte-walk parse.
      // FILE COUNT is the 100 TB dial: a fixed file count would grow
      // each blob with the corpus and serialize the concat — the probe
      // scales files with the corpus (the deployment contract:
      // bounded records/file), so both stages should stay ~linear.
      val recC = graft.ops.Warc.recordString(
        concat(lit("<urn:uuid:"), didC.cast("string"), lit(">")), urlC,
        substring(col("text"), 1, 150))
      time("q155_warc", mult)(
        graft.ops.Warc.parseRecords(
          graft.ops.Warc.asWarcFiles(d, pmod(didC, lit(8L * mult)), didC,
            recC)))
      // q156 core: the one-pass moment fit (d+d(d+1)/2 doubles per
      // partition, map-side combined — the distributed part; the
      // eigensolve is driver-side O(d³) and corpus-independent). fit
      // runs its action eagerly inside the timed block.
      time("q156_pcafit", mult) {
        val m = graft.ops.Pca.fit(e, "embedding", 32)
        import spark.implicits._
        Seq((m.n, m.trace)).toDF("n", "trace")
      }
      // q158: the shipped shape — synthesized 1-3 out-edges/node,
      // 3 damped integer rounds over localCheckpointed pre-partitioned
      // edges. Per-round cost is |V| + map-side-combined |E|→|V|.
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
      // q159 composition core: WARC → parse → extract → canonical-URL
      // argmin dedup → gate (the shipped stage chain minus persists —
      // single-reference here).
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
      // q160 scrub core: domain count FIXED as the corpus grows (the
      // realistic regime — sites don't multiply with pages), so
      // per-domain line-df groups grow linearly; only (dom, 8-byte
      // hash) rows enter the exchange.
      time("q160_boiler", mult)(
        graft.ops.SpanScrub.scrubBoilerplateLines(
          d.select(didC,
            concat(lit("d"), pmod(didC, lit(10L)).cast("string")).as("dom"),
            concat(lit("NAV | home\n"), substring(col("text"), 1, 200),
              lit("\n(c) footer")).as("text")),
          "doc_id", "dom", "text",
          minFracE6 = 600000L, minAbs = 2L, minLen = 3)
          .filter(length(col("clean_text")) >= 0))
      // r15: integer k-means — per-iteration cost is one broadcast-
      // join assignment pass (linear in N·k·d) plus a (cell, dim)
      // partial-combined update (exchange is k·d rows/partition,
      // corpus-independent); expected wall-α ≈ 1.0
      time("q164_kmeans", mult)(
        graft.ops.Kmeans.assignInt(e, "vec_id", "embedding",
          k = 8, iters = 2))
      // q165/q166 composition: at FIXED k the cells grow with the
      // corpus (2 000/8 = 250 → 2 500 per cell at ×10), so the
      // within-cell pair scoring is the quadratic-risk leg — the
      // probe runs the production dispatch (graft.sim.maxBlock), the
      // same guard ScaleProbe100 measures for q110's label cells
      time("q165_semdedup", mult) {
        val cells = graft.ops.Kmeans.assignInt(e, "vec_id", "embedding",
          k = 8, iters = 2).select(col("vec_id"), col("cell"))
        Similarity.semanticDedup(
          e.select(col("vec_id"), col("embedding")).join(cells, Seq("vec_id")),
          "cell", 3000L)
      }
      // r15 privacy gates: cell counts / key dfs are the only
      // exchanges (cell-table-sized, map-side combined) — expected
      // ~linear wall, corpus never shuffles (plan-locked for q168)
      time("q168_kanon", mult)(
        graft.ops.Privacy.suppressSmallCells(
          d.select(col("doc_id"), col("lang"),
            expr("n_chars div 100").as("band")),
          Seq("lang", "band"), k = 10L))
      time("q169_freqgate", mult)(
        graft.ops.Privacy.frequencyThreshold(
          d.select(col("doc_id"),
            split(col("text"), " ").getItem(0).as("key")),
          "key", "doc_id", minDocs = 11L))
      // r16: gzip-member WARC — compression/inflate are member-local
      // CPU inside the same two stages as q155 (grouping shuffle +
      // partition-local walk); expected ~linear wall tracking q155
      // with a constant-factor deflate cost, blobs never re-shuffle
      time("q170_warcgz", mult)(
        graft.ops.Warc.parseGzRecords(
          graft.ops.Warc.asWarcGzFiles(d, pmod(didC, lit(8L * mult)),
            didC, recC)))
      // r16: incremental k-means ingest — the frozen model is fit ONCE
      // on the base corpus (off the timed path, the nightly-artifact
      // contract); the timed stats pass over the ×mult corpus has ONE
      // exchange of map-side-combined (cell, dim) partials, ≤ k·d rows
      // per partition — shuffle records should stay ~CONSTANT as the
      // corpus grows (the q164 ×100 finding, available to a stream)
      // parquet-backed (NOT localCheckpoint): time()'s releaseAll
      // sweeps checkpoint blocks, and a swept localCheckpoint cannot
      // recompute — the same reason the bench artifacts are parquet
      val centsPath = s"/tmp/scale10_cents_x$mult"
      graft.ops.Kmeans.fitCentroids(
          baseEmb, "vec_id", "embedding", k = 8, iters = 1)
        .write.mode("overwrite").parquet(centsPath)
      val frozenCents = spark.read.parquet(centsPath)
      time("q171_cellstats", mult)(
        graft.ops.Kmeans.cellStats(e, "vec_id", "embedding", frozenCents))
    }
    spark.stop()
  }
}
