package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Full-text retrieval over a document corpus: BM25 scoring of a fixed
  * query against every document, top-k by score.
  *
  * Reference behavior: the reference engine's keyword-analytics apps
  * tokenize free text and rank by per-term statistics
  * (`SRC/app/dws/KeywordStatsApp.scala:31-64` computes per-keyword
  * windowed counts); BM25 is the canonical generalization a user of
  * that surface reaches for next — rank DOCUMENTS for a term set, not
  * terms for a window — and the operation an LLM-data pipeline uses
  * for corpus triage ("which documents answer this probe query").
  *
  * Shape at 100 TB (the inverted-postings shape, without the index):
  *  1. one column-pruned partial-agg pass for corpus stats (N, Σdl) —
  *     two longs to the driver, the documented model-sized collect;
  *  2. tokenize + explode, then a LITERAL IN FILTER on the query
  *     terms BEFORE any exchange — only postings rows for the ≤|q|
  *     query terms survive the map side; the corpus text itself never
  *     shuffles. The shuffle carries (doc_id, dl, term) hits only —
  *     for a selective query, a vanishing fraction of the corpus;
  *  3. per-term document frequencies from those postings (≤|q| rows),
  *     broadcast back;
  *  4. per-(doc, term) partial scores as e9-scaled BIGINTs, summed
  *     per doc — INTEGER partials, so the sum is order-independent
  *     (the q70/q82 pattern: never sum doubles across an exchange);
  *  5. global top-k via orderBy+limit → `TakeOrderedAndProject`
  *     (per-partition heaps + driver merge of k rows, no global sort).
  *
  * Engine portability (the DuckDB oracle replays this bit-for-bit):
  * every floating step is a correctly-rounded IEEE double op (+,-,*,/)
  * over identical operands in an identical association order, EXCEPT
  * the single `ln` inside idf — which is quantized to an e6 BIGINT per
  * DISTINCT (term, df) pair, so a last-ulp `ln` disagreement between
  * libm implementations could only flip a result if 1e6·ln(x) sat
  * within ~1e-9 of an integer for one of the ≤|q| actual df values
  * (margins verified ≥ 0.039 for the gated query's corpus).
  */
object Retrieval {

  /** BM25 top-k: score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b) +
    * k1·b·dl/avgdl), idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)
    * (the +1 keeps idf positive for df > N/2 — Lucene's variant).
    *
    * Returns (doc_id, score_e9, n_terms): e9-scaled integer score and
    * the number of distinct query terms the document matched. Only
    * documents matching ≥1 term are candidates; ties break on doc_id.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
               topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // NOT fanned out (r20, measured): plain tokenize is too cheap per
    // row to pay the fan-out's per-task overhead (the retrieval family
    // moved UP ~1 s/query fanned) — see QualityClassifier.features.
    val base = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokenize(lower(col(textCol))).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))

    // corpus stats: two longs (column-pruned scan — only dl survives)
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_toks")).head()
    val nDocs = stats.getLong(0)
    require(nDocs > 0, "empty corpus")
    val avgdl = stats.getLong(1).toDouble / nDocs.toDouble

    // postings for the query terms only — the IN filter runs before the
    // exchange, so the shuffle carries hits, never the corpus. Persisted:
    // BOTH the df aggregation and the scoring join consume it, and
    // without the cache the df branch re-tokenizes the whole corpus
    // (the dominant cost at scale) a second time. Postings are
    // query-hit-sized, not corpus-sized. Lifecycle: CacheScope.release.
    val tf = CacheScope.persist(
      base.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .filter(col("term").isin(queryTerms: _*))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf")))

    // per-term df + e6-quantized idf (≤ |queryTerms| rows; broadcast)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("idf_e6",
        floor(lit(1000000.0) * log(
          (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
          .cast("long"))

    // e9-scaled integer partials: floor BEFORE the sum, so the per-doc
    // aggregation is order-independent integer arithmetic
    val scored = tf.join(broadcast(dfreq.select("term", "idf_e6")), "term")
      .withColumn("part_e9",
        floor(col("idf_e6").cast("double") *
          ((col("tf") * (lit(k1) + lit(1.0))) /
            (col("tf") + lit(k1) * (lit(1.0) - lit(b)) +
              lit(k1) * lit(b) * col("dl") / lit(avgdl))) * lit(1000.0))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("part_e9")).as("score_e9"), count(lit(1)).as("n_terms"))

    scored.orderBy(col("score_e9").desc, col("doc_id")).limit(topK)
  }

  // ————— incremental BM25 index (r17) —————
  //
  // bm25TopK tokenizes the CORPUS per query — right for one-shot
  // triage, wrong for a standing retrieval surface. The index form
  // decomposes BM25's inputs into ADDITIVE sufficient statistics
  // (documents are immutable and belong to exactly one ingest batch):
  //   postings (term, doc_id, tf, dl) — append-only per batch;
  //   stats    (n_docs, n_toks)       — additive counters.
  // so the index after any number of batch appends equals one build
  // over the union corpus ROW FOR ROW, and bm25TopKFromIndex over it
  // is byte-equal to bm25TopK over the union (same integer/IEEE
  // arithmetic on the same operands — q179 gates it under q107's
  // oracle verbatim). At 100 TB the postings table is stored
  // PARTITIONED/BUCKETED BY TERM, so a query scans |q| buckets instead
  // of tokenizing the corpus; the build cost is paid once per batch,
  // not once per query. Streaming face: graft.streaming.Bm25Ingest.

  /** The postings rows for one document batch: (term, doc_id, tf, dl).
    * Same tokenization as [[bm25TopK]] (that equality is the
    * contract). dl rides every posting row of its doc — denormalized
    * so scoring never joins a doc-length table.
    */
  def bm25Postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokenize(lower(col(textCol))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** The additive corpus counters for one document batch — built from
    * the DOCS, not the postings: a zero-token document has no postings
    * row but still counts toward n_docs (and so toward avgdl and idf).
    */
  def bm25Stats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
        TextFunctions.tokenize(lower(col(textCol))).as("toks"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("toks")).cast("long")), lit(0L)).as("n_toks"))

  /** BM25 top-k over a standing postings index — byte-equal to
    * [[bm25TopK]] over the corpus the index was built from (identical
    * idf quantization, e9 integer partials, tie order). `stats` is the
    * summed counter frame (one row: n_docs, n_toks). Scale shape: the
    * term IN filter prunes the postings scan (partition pruning when
    * the table is laid out by term); df comes from the pruned rows;
    * everything downstream is query-hit-sized.
    */
  def bm25TopKFromIndex(postings: DataFrame, stats: DataFrame,
                        queryTerms: Seq[String], k1: Double = 1.2,
                        b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val st = stats.select(col("n_docs"), col("n_toks")).head()
    val nDocs = st.getLong(0)
    require(nDocs > 0, "empty corpus")
    val avgdl = st.getLong(1).toDouble / nDocs.toDouble
    val tf = CacheScope.persist(
      postings.select(col("doc_id"), col("dl"), col("term"), col("tf"))
        .filter(col("term").isin(queryTerms: _*)))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("idf_e6",
        floor(lit(1000000.0) * log(
          (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
          .cast("long"))
    val scored = tf.join(broadcast(dfreq.select("term", "idf_e6")), "term")
      .withColumn("part_e9",
        floor(col("idf_e6").cast("double") *
          ((col("tf") * (lit(k1) + lit(1.0))) /
            (col("tf") + lit(k1) * (lit(1.0) - lit(b)) +
              lit(k1) * lit(b) * col("dl") / lit(avgdl))) * lit(1000.0))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("part_e9")).as("score_e9"), count(lit(1)).as("n_terms"))
    scored.orderBy(col("score_e9").desc, col("doc_id")).limit(topK)
  }

  /** Positional postings (term, doc_id, pos) — the phrase-query side
    * of the index family. Same tokenization as [[bm25TopK]]; pos is
    * the 0-based token index.
    */
  def positionalPostings(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokenize(lower(col(textCol)))).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos"))

  /** EXACT PHRASE MATCH over positional postings: documents containing
    * the n-word phrase as adjacent tokens, with the occurrence count
    * (overlapping occurrences each count — one per anchor position).
    *
    * Shape — the inverted-index phrase plan, not a per-row scan:
    * postings are filtered to the phrase's DISTINCT terms before any
    * exchange (the [[bm25TopK]] IN-filter doctrine — only hit rows
    * shuffle), then each word joins on (doc_id, pos − slot): every
    * word of one occurrence lands on the same anchor key, so the
    * n-way join is n−1 co-partitioned hash joins over hit rows (one
    * partitioning reused — the join key never changes). Repeated
    * words in the phrase work: the slot offset makes each position
    * satisfy exactly the slots whose anchor aligns. At 100 TB the
    * postings table is the stored artifact ([[positionalPostings]]
    * appended per ingest batch, term-partitioned), and the query
    * touches |distinct words| buckets.
    */
  def phraseMatch(docs: DataFrame, idCol: String, textCol: String,
                  phrase: Seq[String]): DataFrame =
    phraseMatchFromIndex(positionalPostings(docs, idCol, textCol), phrase)

  /** [[phraseMatch]] over a STANDING positional-postings table
    * (columns term, doc_id, pos — [[positionalPostings]]' shape,
    * appended per ingest batch by `graft.streaming.PhraseIngest`):
    * postings rows are position facts, trivially additive across
    * disjoint document batches, so the standing index answers
    * byte-equal to the one-shot operator over the union corpus (q187
    * gates it under q180's oracle verbatim).
    */
  def phraseMatchFromIndex(postings: DataFrame,
                           phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two words")
    val posts = CacheScope.persist(
      postings.select(col("term"), col("doc_id"), col("pos"))
        .filter(col("term").isin(phrase.distinct: _*)))
    val anchors = phrase.zipWithIndex.map { case (w, i) =>
      posts.filter(col("term") === w)
        .select(col("doc_id"), (col("pos") - lit(i.toLong)).as("anchor"))
    }.reduce(_.join(_, Seq("doc_id", "anchor")))
    anchors.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** TF-IDF cosine document-pair similarity — the vector-space-model
    * sibling of the n-gram Jaccard family (set overlap) and BM25
    * (query-relevance): weighted-term cosine between DOCUMENTS.
    *
    * Arithmetic contract (the engine's integer doctrine):
    *  - idf quantizes to ⌊10³·ln(N/df)⌋ BEFORE weighting, so weights
    *    `tf·idf_e3` are exact integers and every sum (norms, dots) is
    *    order-independent — summed as DECIMAL(38,0) because a 100 TB
    *    corpus can push `w²` past long range (tf·idf_e3 > 3·10⁹);
    *  - the only float ops are the final sqrt/divide (IEEE
    *    correctly-rounded on both engines, the q90 precedent), so
    *    ⌊10⁴·cos⌋ is oracle-exact.
    *
    * Vector space = terms with `minDf ≤ df ≤ min(maxDfFrac·N,
    * maxDfAbs)`: df-1 terms cannot pair (dropping them shrinks norms to
    * the PAIRABLE space), and the df cap bounds candidate mass per term.
    * THE FRACTIONAL CAP ALONE IS NOT A SCALE CONTROL: per-term pair
    * mass is df², so a cap that GROWS with N admits ever-larger
    * near-stopword blocks — the r11 10× probe measured exactly that
    * (×2 corpus: the fraction admitted replica-local stopwords and the
    * pair space went 31 k → 19.6 M rows, 1.8 s → 87 s). `maxDfAbs` is
    * the absolute dial a 100 TB deployment must set (it bounds work
    * per term at maxDfAbs² regardless of corpus growth — the same
    * doctrine as [[graft.ops.Dedup.lshParams]]). Only (term-hash, id,
    * weight) triples shuffle; term strings and text stay columnar.
    *
    * EAGER by design: composing this operator runs Spark jobs (the
    * corpus count and the collision guard's aggregate, which also
    * materializes the persisted term caches) — callers composing plans
    * lazily should call it at execution time. [[topKeywords]] is the
    * fully-lazy sibling (in-plan nDocs, no guard — it never groups by
    * the term HASH, so collisions cannot merge dimensions there).
    */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                       minSimE4: Long, minDf: Long = 2,
                       maxDfFrac: Double = 0.5,
                       maxDfAbs: Long = Long.MaxValue): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // plain \s+ split, NOT the CJK-segmenting tokenize: the oracle
    // replays string_split_regex, and the two must agree on any fixture
    // (the BpeTrain r11 precedent — engine-portability over segmentation)
    val base = docs.select(col(idCol).as("id"),
      split(lower(col(textCol)), "\\s+").as("toks"))
    val nDocs = base.count()
    // terms is persisted BEFORE the collision guard below runs its eager
    // aggregate: the guard materializes dfreq's lineage, and without the
    // persist the tokenize→explode→groupBy pass would execute once for the
    // guard and AGAIN for the weights join — at 100 TB that doubles the
    // operator's most expensive stage (the r12 q123 regression)
    val terms = CacheScope.persist(base
      .select(col("id"), explode(col("toks")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf")))
    val dfreq = CacheScope.persist(
      terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= minDf &&
          col("df") <= lit(math.min(math.floor(maxDfFrac * nDocs), maxDfAbs.toDouble)))
        .withColumn("idf_e3",
          floor(lit(1000.0) * log(lit(nDocs.toDouble) / col("df"))).cast("long")))
    // the df-filtered vocabulary is dictionary-sized; a 64-bit term-hash
    // collision would silently merge two terms' weights into one vector
    // dimension, so it fails loudly here instead (one cheap aggregate
    // over the just-persisted dictionary — the persists above make this
    // the materializing action, not a second full corpus pass)
    FuzzyJoin.requireCollisionFree(
      dfreq.select(col("term"), xxhash64(col("term")).as("__th")), "term", "__th")
    // NOT persisted: with terms and dfreq cached above, w is one
    // AQE-broadcastable dictionary join on top of the cache — cheaper to
    // recompute map-side in each consumer than to force a third
    // materialization barrier and cache write of the same word-mass rows
    val w = terms.join(dfreq.select(col("term"), col("idf_e3")), "term")
      .select(xxhash64(col("term")).as("th"), col("id"),
        (col("tf") * col("idf_e3")).as("w"))
    // operands cast to decimal BEFORE the multiply — (w*w).cast(dec)
    // would run the product on longs first and overflow (ANSI throw)
    // exactly in the regime the decimal sum exists for
    val norms = w.groupBy(col("id"))
      .agg(sqrt(sum(col("w").cast(dec) * col("w").cast(dec)).cast("double")).as("nrm"))
    val dots = w.select(col("th"), col("id").as("id_a"), col("w").as("wa"))
      .join(w.select(col("th"), col("id").as("id_b"), col("w").as("wb")), "th")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("wa").cast(dec) * col("wb").cast(dec)).cast("double").as("dot"))
    dots
      .join(norms.select(col("id").as("id_a"), col("nrm").as("na")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        floor(lit(10000.0) * (col("dot") / (col("na") * col("nb"))))
          .cast("long").as("sim_e4"))
      .filter(col("sim_e4") >= minSimE4)
  }

  /** Per-document top-k KEYWORDS by TF-IDF weight — the extractive
    * tagging op (search facets, topic labels, weak supervision
    * features), sharing [[tfidfCosinePairs]]' exact conventions:
    * `\s+` lowercased split, integer weights `tf·⌊10³·ln(N/df)⌋`, and
    * the same `minDf ≤ df ≤ min(maxDfFrac·N, maxDfAbs)` vocabulary
    * screen (stopwords fall out via the df cap, hapaxes via minDf —
    * for keyword extraction minDf=2 keeps corpus-attested terms only).
    *
    * Determinism: rank within the document by (w DESC, term ASC) —
    * integer weights, lexicographic tie-break, so top-k is
    * engine-exact, never "whichever tied term the heap kept".
    *
    * Scale shape: one (id, term) count aggregate, a dictionary-sized
    * df/idf join (AQE-broadcastable), and a PER-DOCUMENT row_number
    * window — partitioned by doc id, so the sort unit is one
    * document's vocabulary, never a global or per-term sort. Term
    * strings do shuffle here (they ARE the output), at word mass —
    * the same class as the q04 keyword aggregate.
    */
  def topKeywords(docs: DataFrame, idCol: String, textCol: String,
                  k: Int, minDf: Long = 2, maxDfFrac: Double = 0.5,
                  maxDfAbs: Long = Long.MaxValue): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val base = docs.select(col(idCol).as("id"),
      split(lower(col(textCol)), "\\s+").as("toks"))
    // nDocs derived IN the plan (1-row count aggregate, broadcast into
    // the df screen) — composing this operator must not trigger a Spark
    // job, and the cap must not freeze against a corpus snapshot taken
    // at build time (r12 advice). The arithmetic is the same IEEE
    // double multiply/floor/ln the driver-side literal produced, so the
    // oracle replay is unchanged.
    val totals = docs.select(lit(1).as("__one"))
      .agg(count(lit(1)).as("__n"))
    val terms = base
      .select(col("id"), explode(col("toks")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totals))
      .filter(col("df") >= minDf &&
        col("df") <= least(floor(lit(maxDfFrac) * col("__n").cast("double")),
          lit(maxDfAbs)).cast("double"))
      .withColumn("idf_e3",
        floor(lit(1000.0) * log(col("__n").cast("double") / col("df")))
          .cast("long"))
      .drop("__n")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("w").desc, col("term").asc)
    // filter the RAW row_number (cast only in the output projection):
    // Catalyst's InferWindowGroupLimit matches a rank predicate sitting
    // directly on the window expression, turning the per-doc sort into
    // a map-side top-k heap (WindowGroupLimit, the q63 shape)
    terms.join(dfreq.select(col("term"), col("idf_e3")), "term")
      .select(col("id"), col("term"), col("tf"),
        (col("tf") * col("idf_e3")).as("w"))
      .withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .select(col("id").as(idCol), col("term"), col("tf"),
        col("w"), col("rk").cast("long").as("rk"))
  }

  /** Vocabulary drift between two corpora: the top-k tokens by
    * per-token Jensen–Shannon divergence contribution — the drill-down
    * behind "what actually changed between snapshot A and B / between
    * my train mix and the eval domain". Laplace-smoothed unigram
    * distributions (p = (c+1)/(N+V) over the UNION vocabulary, so
    * zero-count tokens are defined on both sides), per-token
    * contribution ½p·ln(p/m) + ½q·ln(q/m) with m = (p+q)/2 —
    * non-negative by the log-sum inequality, and summing the e9 floors
    * of the two halves keeps every value an integer an oracle can
    * replay (the probabilities are exact rationals cast to double, so
    * both engines compute identical IEEE ln/multiply/floor).
    *
    * Scale shape: two token-count aggregates (map-side combined, the
    * q63 class), a vocabulary-sized full-outer join on the term, a
    * 1-row totals broadcast, then `TakeOrderedAndProject` for the
    * top-k — per-partition heaps, no global sort; nothing document-
    * sized ever shuffles twice. Ties break lexicographically.
    */
  def vocabularyDivergence(a: DataFrame, b: DataFrame, textCol: String,
                           topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    def counts(df: DataFrame) = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val j = counts(a).withColumnRenamed("c", "ca")
      .join(counts(b).withColumnRenamed("c", "cb"), Seq("term"), "full_outer")
      .select(col("term"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val totals = j.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    j.crossJoin(broadcast(totals))
      .withColumn("pa",
        (col("ca") + 1).cast("double") / (col("na") + col("v")).cast("double"))
      .withColumn("pb",
        (col("cb") + 1).cast("double") / (col("nb") + col("v")).cast("double"))
      .withColumn("m", (col("pa") + col("pb")) / lit(2.0))
      .withColumn("js_e9",
        (floor(lit(500000000.0) * (col("pa") * log(col("pa") / col("m")))) +
          floor(lit(500000000.0) * (col("pb") * log(col("pb") / col("m")))))
          .cast("long"))
      .select(col("term"), col("ca"), col("cb"), col("js_e9"))
      .orderBy(col("js_e9").desc, col("term").asc)
      .limit(topK)
  }
}
