package graft

/** Locks the scale-critical physical-plan properties documented in
  * SCALE.md: these are the shapes that make the operators viable at
  * 100 TB, and a silent regression (a lost broadcast, a nested loop, a
  * dropped map-side cut, a widened scan) is a correctness bug for the
  * scale contract even when row-level results stay right.
  */
class PlanPropertiesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  private def exchanges(p: String): Int =
    p.linesIterator.count(_.contains("Exchange hashpartitioning"))

  test("q08 dim enrichment: all-broadcast, zero shuffle exchanges") {
    val p = plan("q08_dim_enrich")
    assert(p.contains("BroadcastHashJoin"), p.take(300))
    assert(exchanges(p) == 0, s"dim enrichment must not shuffle the fact side:\n${p.take(600)}")
  }

  test("q61 split assignment and q67/q69/q87 scrubbing are shuffle-free projections") {
    for (q <- Seq("q61_split_assign", "q67_pii_redact", "q69_quality_gate",
                  "q87_self_repetition", "q89_chunk_documents")) {
      val p = plan(q)
      assert(exchanges(p) == 0, s"$q must be a narrow projection:\n${p.take(400)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("q63 top-k tokens: WindowGroupLimit cuts before the final window") {
    val p = plan("q63_top_tokens")
    assert(p.contains("WindowGroupLimit"), p.take(600))
    assert(p.contains("Partial"), "map-side (Partial) group-limit expected:\n" + p.take(600))
  }

  test("range-join family never plans a nested loop or cartesian") {
    for (q <- Seq("q72_range_join", "q73_interval_overlap")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q:\n${p.take(400)}")
    }
  }

  test("scans prune to the referenced columns") {
    // q01 touches 5 of lineitem's columns; the scan must not read more
    // (the ReadSchema field is elided in toString, so parse the
    // FileScan's complete output-column bracket instead)
    val p1 = plan("q01_pricing_summary")
    val read = "FileScan parquet \\[([^\\]]*)\\]".r
      .findFirstMatchIn(p1).map(_.group(1)).getOrElse("")
    assert(read.nonEmpty && read.split(",").length <= 5, s"q01 scan too wide: $read")
    // q60 reads only (doc_id, lang) from documents — never text
    val p2 = plan("q60_stratified_sample")
    val read2 = "FileScan parquet \\[([^\\]]*)\\]".r
      .findFirstMatchIn(p2).map(_.group(1)).getOrElse("")
    assert(read2.nonEmpty && !read2.contains("text"), s"q60 must not read text: $read2")
  }

  test("q13 pushes the event-type predicate into the parquet scan") {
    val p = plan("q13_log_split_page")
    assert(p.contains("PushedFilters: [") && p.contains("event_type"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("dedupByPairsScored windows only the clustered minority") {
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti}
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 1000)
      .select(col("id").as("doc_id"), (col("id") % 7).cast("double").as("score"))
    val pairs = spark.range(0, 4)
      .select((col("id") * 2).as("id_a"), (col("id") * 2 + 1).as("id_b"))
    val out = ops.Dedup.dedupByPairsScored(docs, "doc_id", "score", pairs)
    val lp = out.queryExecution.optimizedPlan
    // exactly one ranking window, and it sits ABOVE the inner label join —
    // i.e. the window exchange carries only rows that matched a cluster
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.size == 1, s"expected one window:\n$lp")
    val innerUnderWindow = windows.head.collectFirst {
      case j: Join if j.joinType == Inner => j }
    assert(innerUnderWindow.nonEmpty,
      s"window must rank the label-joined minority, not the corpus:\n$lp")
    // the majority branch is an anti join with NO window beneath or above it
    val antis = lp.collect { case j: Join if j.joinType == LeftAnti => j }
    assert(antis.size == 1, s"expected one anti join:\n$lp")
    assert(antis.head.collectFirst { case w: LWindow => w }.isEmpty,
      s"unclustered majority must stream through without a window:\n$lp")
  }

  test("q93/q101 derive from the report artifact: no pair-join recompute") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val sf = "/root/testdata/sf0.001"
    // q52 builds + memoizes the labels artifact for this (session, dir)
    SparkEntry.queries("q52_dedup_clusters")(spark, sf).count()
    // the histogram view is two aggregations over a parquet scan of the
    // labels table — NO join anywhere (the r8 shape recomputed the
    // whole quadratic pair enumeration + CC loop)
    val hist = SparkEntry.queries("q93_cluster_size_histogram")(spark, sf)
    val lp93 = hist.queryExecution.optimizedPlan
    assert(lp93.collect { case j: Join => j }.isEmpty,
      s"q93 must not recompute pairs/CC:\n$lp93")
    assert(hist.count() >= 1)
    // keep-best reads the same artifact: its only joins attach labels to
    // the corpus (inner + anti) — no self-join of the token table (the
    // pair enumeration's signature shape)
    val keep = SparkEntry.queries("q101_dedup_keep_best")(spark, sf)
    val joins93 = keep.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins93.size == 2,
      s"q101 expects exactly the label inner join + the anti join:\n" +
        keep.queryExecution.optimizedPlan)
  }

  test("q78 token rarity: one tokenize pass, head joins broadcast") {
    // ONE explode feeds the cached per-(doc,token) counts: in the
    // optimized plan every consumer must read the InMemoryRelation
    // (a leaf — collect does not descend into cachedPlan), so any
    // Generate OUTSIDE a cache means the tokenize pass is recomputed
    val lp = SparkEntry.queries("q78_token_rarity")(spark, sf)
      .queryExecution.optimizedPlan
    val gens = lp.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }.size
    assert(gens == 0, s"tokenize explode recomputed outside the cache:\n$lp")
    val caches = lp.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m }.size
    assert(caches >= 1, s"expected the token-count cache in the plan:\n$lp")
    val p = plan("q78_token_rarity")
    // the Zipf head (and the anti join defining the tail) joins by
    // broadcast — a sort-merge join on the raw token key is the skew
    // shape this query exists to avoid
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    val tokenSmj = p.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("tok#"))
    assert(!tokenSmj, "no sort-merge join keyed on the raw token column:\n" +
      p.linesIterator.filter(_.contains("SortMergeJoin")).mkString("\n"))
  }

  test("q31 minhash: text never appears in an exchange") {
    // shuffles carry ids/hashes/signatures; the raw text column must not
    // be a field of any Exchange's output
    val p = plan("q31_dedup_minhash")
    val shufflesWithText = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("text#"))
    assert(shufflesWithText.isEmpty, shufflesWithText.mkString("\n"))
  }

  test("q80 shared windows: candidate pairing shuffles fingerprints, not text") {
    // the candidate self-join must exchange only (id, 8-byte window
    // hash); window STRINGS appear in exchanges only downstream of the
    // survivor semi-join (the collect_set verify on candidate docs)
    val p = plan("q80_shared_window_pairs")
    val textShuffles = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(l => l.contains("text#") || l.contains("txt#"))
    assert(textShuffles.isEmpty, textShuffles.mkString("\n"))
  }

  test("q85 bloom decontamination: native bloom probe, no corpus-wide join fallback") {
    val p = plan("q85_bloom_decontaminate")
    assert(p.contains("might_contain"), "bloom probe must be the codegen'd " +
      s"BloomFilterMightContain expression:\n${p.take(600)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(600))
  }

  test("incremental dedup smallBatch profile: index side never shuffles for candidates") {
    import org.apache.spark.sql.functions._
    // streaming-trigger shape: tiny batch vs a large standing index —
    // the candidate band join must BROADCAST the batch-side bucket
    // table (the index side streams map-side), and the estimate
    // prefilter's index-wide signature self-joins must be absent
    val docs = spark.range(0, 2000)
      .select(col("id").as("doc_id"),
        concat(lit("document body text number "), col("id")).as("text"))
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1).limit(50)
    val index = ops.Dedup.buildMinhashIndex(corpus, "doc_id", "text", 5, 32)
    val (pairs, sigs) = ops.Dedup.minhashLshIncrementalWithIndex(
      fresh, corpus, index, "doc_id", "text", 5, 32, 8, 0.8, smallBatch = true)
    pairs.count() // materialize so AQE finalizes join strategies
    val p = pairs.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"batch bucket table must broadcast:\n${p.take(800)}")
    // the estimate prefilter's signature columns (a0.., b0..) must not
    // appear anywhere — the small-batch profile verifies exactly
    assert(!p.contains("a0#") && !p.contains("b0#"),
      "estimate prefilter must be absent in the smallBatch profile")
    // raw text never enters an exchange (the family invariant)
    val textShuffles = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("text#"))
    assert(textShuffles.isEmpty, textShuffles.mkString("\n"))
    // the returned signature frame is the index schema, reusable for
    // the append without recompute
    assert(sigs.columns.toSet == index.columns.toSet)
  }

  test("q109 token budget: bucket stats broadcast back, corpus never sort-merge joins") {
    val p = plan("q109_token_budget")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket-stats table must broadcast:\n${p.take(600)}")
    assert(!p.contains("SortMergeJoin"),
      "the corpus must stream map-side through the stats join")
    // only (doc_id, lang, n_chars) are referenced — the scan must not
    // read document text
    val reads = "FileScan parquet \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(reads.nonEmpty && reads.forall(!_.contains("text")),
      s"q109 must not read text: $reads")
  }

  test("q110 semantic dedup: AQE broadcasts the dominated set into the anti join") {
    // the dup-sized dominated frame is only known small at RUNTIME —
    // materialize so AQE finalizes the join strategy
    val out = SparkEntry.queries("q110_semantic_dedup")(spark, sf)
    out.count()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), p.take(400))
    assert(p.contains("BroadcastHashJoin"),
      s"AQE must convert the anti join to broadcast at this scale:\n${p.take(800)}")
  }

  test("q113 LM scoring and q114 paragraph dedup: no text in any exchange") {
    // the family invariant: tokens/grams/paragraphs hash map-side,
    // only (id, 8-byte keys, counts) enter the shuffles
    for ((q, words) <- Seq(
      "q113_lm_quality" -> Seq("text#", "gram#", "w1#", "w2#", "toks#"),
      "q114_paragraph_dedup" -> Seq("text#", "col#"))) {
      val p = plan(q)
      val bad = p.linesIterator
        .filter(_.contains("Exchange hashpartitioning"))
        .filter(l => words.exists(l.contains)).toSeq
      assert(bad.isEmpty, s"$q shuffles raw text:\n${bad.mkString("\n")}")
    }
  }

  test("q111 epoch upsample: one strata-key shuffle, a generator, and no joins") {
    val p = plan("q111_epoch_upsample")
    assert(p.contains("Generate explode"), p.take(500))
    assert(!p.contains("Join"), "replication must not join against anything")
    assert(exchanges(p) <= 1, s"expected the single window rank shuffle:\n${p.take(600)}")
  }

  test("q115 prototypicality: model-sized centroid table broadcasts; vectors never shuffle") {
    val p = plan("q115_prototypicality")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    // the embedding array may only cross the wire in the broadcast of
    // the centroid model — never in a hash-partitioned exchange
    val vecShuffles = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("embedding#"))
    assert(vecShuffles.isEmpty, vecShuffles.mkString("\n"))
  }

  test("q116 fuzzy pairs: block-key equi-join, no cartesian or nested loop") {
    val p = plan("q116_fuzzy_name_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(600))
    // candidate generation joins on the block key, and the scan reads
    // only the name column (dictionary shape: nothing else is needed)
    val read = "FileScan parquet \\[([^\\]]*)\\]".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.split(",").length <= 1, s"q116 scan too wide: $read")
  }

  test("q129 repetition signals: line/gram text never appears in an exchange") {
    // the line and n-gram count aggregates shuffle (id, hash, len)
    // only — document text, line strings, and gram strings must all be
    // consumed map-side before the exchange
    val p = plan("q129_repetition")
    val textShuffles = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(l => l.contains("text#") || l.contains("line#") || l.contains(", g#"))
    assert(textShuffles.isEmpty, textShuffles.mkString("\n"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(600))
  }

  test("q134 top keywords: per-document WindowGroupLimit cuts before the rank") {
    // Spark's group-limit pushdown must fire for the rk <= k filter so
    // each document's vocabulary is heap-cut map-side, like q63
    val p = plan("q134_top_keywords")
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("q168 k-anonymity: the only exchange is the cell-count aggregate") {
    // the corpus side must be a bare scan into a broadcast join — the
    // suppression join-back must never shuffle the corpus; the single
    // hash exchange is the map-side-combined (quasi-cols) cell count
    val p = plan("q168_k_anonymity")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(exchanges(p) == 1,
      s"expected exactly the cell-count exchange:\n${p.take(800)}")
  }

  test("q169 frequency threshold: key text never enters an exchange") {
    // the memorization-gate doctrine: keys can be KB-sized extracted
    // spans, so both the distinct/count pass and the semi join must
    // exchange only the 2×8-byte xxhash64 fingerprint — the key string
    // column must not be a field of any hash exchange's output
    val p = plan("q169_frequency_threshold")
    val exLines = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exLines.nonEmpty, p.take(600))
    exLines.foreach { l =>
      assert(!l.contains("key#"),
        s"raw key text in a frequency-gate exchange:\n$l")
    }
  }

  test("q172 indexed gz fetch: blob payloads never enter an exchange") {
    // the CDX-fetch disposition: the (file_id, member_index, offset,
    // len) INDEX is the small side and must move to the blobs — the
    // gz file payloads must never hash-shuffle (at crawl scale they
    // are the corpus bytes). A lost broadcast here silently turns the
    // random-access fetch into a corpus-sized shuffle.
    val p = plan("q172_warcgz_indexed_fetch")
    p.linesIterator.filter(_.contains("Exchange")).foreach { l =>
      assert(!l.contains("payload#"),
        s"gz blob payload in an exchange:\n$l")
    }
    assert(p.contains("BroadcastHashJoin"),
      s"the index side must broadcast:\n${p.take(800)}")
  }

  test("q179/q180 retrieval index: corpus text never enters an exchange") {
    // the postings doctrine: the term IN filter (q180: the phrase's
    // words; q179: the BM25 query terms) runs BEFORE any exchange, so
    // shuffles carry hit rows — never document text. A lost filter
    // pushes the full corpus through the n-way phrase join.
    for (q <- Seq("q179_bm25_index", "q180_phrase_match")) {
      val p = plan(q)
      p.linesIterator.filter(_.contains("Exchange")).foreach { l =>
        assert(!l.contains("text#"), s"$q: corpus text in an exchange:\n$l")
      }
    }
  }

  test("q190 classifier training: tokens hash map-side, text never enters an exchange") {
    // the scoring-family invariant applied to gradient descent: the
    // token-count frame aggregates on (doc_id, y, xxhash64(w)) with
    // map-side partials, so every training exchange carries
    // (id, 8-byte hash, count) — never document text or token strings
    val p = plan("q190_quality_lr_scores")
    val bad = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(l => l.contains("text#") || l.contains(", w#") ||
        l.contains("(w#"))
      .toSeq
    assert(bad.isEmpty, s"classifier shuffles raw text/tokens:\n${bad.mkString("\n")}")
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("q193 streamed-index serve: payload vectors only re-rank; index rows route the join") {
    // both serves must join the INDEX (vec_id, cell, codes) — the
    // full-precision embeddings may appear only in the point-lookup
    // re-rank join and the query-side LUT build, never in a
    // hash-partitioned exchange of the corpus
    val p = plan("q193_pq_streamed_serve")
    val vecShuffles = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("embedding#"))
      .toSeq
    assert(vecShuffles.isEmpty, vecShuffles.mkString("\n"))
  }

  test("q164 k-means assignment: the corpus never hash-shuffles") {
    // the r15 probe finding, locked: assignment must be the narrow
    // fold over the broadcast 1-row centroid array (a scalar-broadcast
    // BNLJ is the EXPECTED shape here — build side is one row), with
    // zero hash exchanges; the only exchange anywhere is the k-row
    // centroid aggregation's SinglePartition hop
    val p = plan("q164_kmeans_int")
    assert(exchanges(p) == 0,
      s"k-means assignment must not shuffle the corpus:\n${p.take(800)}")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross"), p.take(800))
  }
}
