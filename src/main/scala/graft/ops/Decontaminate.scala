package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomProbe

/** Benchmark/test-set decontamination at 100 TB: remove (or flag) every
  * corpus row whose key appears in a contamination list, WITHOUT
  * shuffling the corpus.
  *
  * The naive shape — `corpus.join(contam, key, "left_anti")` — is exact
  * but hash-partitions BOTH sides: at 100 TB the corpus-side exchange
  * dominates the job even though the contamination list is a few
  * million keys. (AQE turns it into a broadcast anti join when the
  * contam side is small enough to broadcast as a hash relation, but
  * the hash-relation form is ~30 bytes/key in executor memory —
  * a 10⁸-key contamination list stops broadcasting long before a
  * bloom filter of the same keys stops fitting.)
  *
  * Two-phase exact shape instead (the row-level runtime-filter design
  * Spark itself uses for shuffle pruning, applied to semantics):
  *  1. BLOOM PREFILTER, zero shuffles: an ~n·log₂(1/fpp)·1.44-bit
  *     bloom sketch of the contamination keys is built (one partial-agg
  *     pass over the small side), shipped in the task binary, and
  *     probed by a codegen'd `BloomFilterMightContain` on
  *     `xxhash64(key)` — the corpus streams through map-side, no
  *     exchange. Bloom negatives are DEFINITE non-members: those rows
  *     are clean, done, never shuffled.
  *  2. EXACT VERIFY on bloom positives only: true matches + an fpp
  *     fraction of false positives join (anti/semi) against the real
  *     key list. The corpus-side exchange now carries |matches| +
  *     fpp·|corpus| rows instead of |corpus|.
  *
  * Result is EXACTLY the anti-join (bloom has no false negatives, and
  * every false positive is cleared by phase 2) — the bloom changes the
  * physical plan, never the answer. fpp trades sketch bits against
  * phase-2 shuffle rows: at fpp=1% the verify shuffle is ~1% of corpus
  * rows, at ~12 bits per contamination key.
  *
  * [[Decontaminate.prepare]] builds the sketch ONCE and returns a
  * reusable filter — the shape for recurring jobs and streaming
  * micro-batches, where rebuilding the bloom per batch would re-scan
  * the contamination list every trigger.
  */
object Decontaminate {

  /** A built contamination filter: the serialized bloom sketch plus the
    * distinct key list for the exact phase. Reusable across any number
    * of corpora/batches keyed by the same domain.
    */
  final class Prepared private[Decontaminate](bloomBytes: Array[Byte],
                                              keys: DataFrame) {

    /** Codegen'd map-side membership probe for `corpusKey`. */
    def mightContain(corpusKey: Column): Column =
      BloomProbe.mightContainLong(bloomBytes, xxhash64(corpusKey))

    /** Exact `corpus ANTI JOIN contam`, corpus-side shuffle reduced to
      * bloom-positive rows.
      */
    def antiJoin(corpus: DataFrame, corpusKey: Column): DataFrame = {
      // NULL-safe routing: a NULL corpus key can never equal a
      // contamination key (SQL null semantics — a plain left_anti KEEPS
      // null-key rows), so null keys belong on the clean leg
      // unconditionally. The probe itself feeds xxhash64 (never null),
      // but the coalesce makes the contract independent of the hash's
      // null behavior rather than an accident of it.
      val mc = coalesce(mightContain(corpusKey), lit(false))
      // definite non-members (and null keys) stream straight through —
      // no exchange
      val clean = corpus.filter(!mc || corpusKey.isNull)
      // bloom positives (true matches + ~fpp of corpus) get the exact check
      val cleared = corpus.filter(mc && corpusKey.isNotNull)
        .join(keys, corpusKey === col("__k"), "left_anti")
      clean.unionByName(cleared)
    }

    /** Keep-everything variant: flags each corpus row with
      * `contaminated` instead of dropping it (audit / lineage mode).
      * Bloom negatives are flagged false map-side; only bloom positives
      * pay the exact semi/anti joins.
      */
    def flag(corpus: DataFrame, corpusKey: Column): DataFrame = {
      // same NULL-safe routing as antiJoin: null keys are definitionally
      // uncontaminated and must not be dropped ("keeps every row")
      val mc = coalesce(mightContain(corpusKey), lit(false))
      // persisted: BOTH verify legs (semi + anti) consume the positives —
      // unpersisted, each leg re-scans the full corpus through the bloom
      // probe (three 100 TB scans instead of one + a tiny cached frame;
      // positives are |matches| + fpp·|corpus| rows by construction).
      // Lifecycle: CacheScope.release after the consuming action.
      val positives = CacheScope.persist(
        corpus.filter(mc && corpusKey.isNotNull))
      // ONE marker left join replaces the semi+anti pair (r10 review:
      // each leg re-aggregated the contamination list separately) —
      // `keys` is distinct, so the join cannot multiply rows
      val verified = positives
        .join(keys.withColumn("__hit", lit(true)), corpusKey === col("__k"), "left")
        .withColumn("contaminated", coalesce(col("__hit"), lit(false)))
        .drop("__k", "__hit")
      corpus.filter(!mc || corpusKey.isNull)
        .withColumn("contaminated", lit(false))
        .unionByName(verified)
    }
  }

  /** Build the bloom sketch (one aggregation pass over the
    * contamination list) and capture the distinct keys for the exact
    * phase. `keys` is persisted by the caller's lifecycle if reused —
    * it is a plain DataFrame, re-evaluated per use otherwise.
    */
  def prepare(contam: DataFrame, contamKey: Column,
              fpp: Double = 0.01): Prepared = {
    // persisted for prepare's own two eager passes (count + bloomFilter
    // each ran the full distinct shuffle — r10 review); both complete
    // inside this call, so the cache is dropped before returning
    val hashed = contam.select(xxhash64(contamKey).as("__ck")).distinct().persist()
    try {
      val n = math.max(hashed.count(), 1L)
      val bloom = hashed.stat.bloomFilter("__ck", n, fpp)
      val os = new java.io.ByteArrayOutputStream()
      bloom.writeTo(os)
      new Prepared(os.toByteArray, contam.select(contamKey.as("__k")).distinct())
    } finally { hashed.unpersist(blocking = false); () }
  }

  /** One-shot exact `corpus ANTI JOIN contam` (see [[Prepared.antiJoin]]). */
  def antiJoin(corpus: DataFrame, corpusKey: Column,
               contam: DataFrame, contamKey: Column,
               fpp: Double = 0.01): DataFrame =
    prepare(contam, contamKey, fpp).antiJoin(corpus, corpusKey)

  /** One-shot flag variant (see [[Prepared.flag]]). */
  def flag(corpus: DataFrame, corpusKey: Column,
           contam: DataFrame, contamKey: Column,
           fpp: Double = 0.01): DataFrame =
    prepare(contam, contamKey, fpp).flag(corpus, corpusKey)

  /** GRADED contamination: per-document overlap FRACTION against a
    * benchmark set's word n-grams, not a boolean key hit — the
    * "n-gram overlap" decontamination measure (GPT-3 appendix C /
    * PaLM-style: a training doc is contaminated to the degree its
    * n-grams appear verbatim in an eval set). The boolean operators
    * above catch exact-key leaks; this catches PARTIAL leaks — an eval
    * question quoted inside an otherwise-clean document — and returns
    * a score the pipeline can threshold per-use instead of a
    * hard-coded drop.
    *
    * Returns one row per corpus document with ≥1 n-gram:
    * (doc_id, n_grams, hits, frac_e4) — distinct n-gram count, how
    * many of those appear anywhere in the benchmark set, and
    * ⌊1e4·hits/n_grams⌋.
    *
    * Shape at 100 TB:
    *  1. tokenize + word-n-gram + distinct per row — all row-local,
    *     zero shuffles, codegen'd (`zip_with` against shifted slices);
    *  2. the ONLY exchange carries (doc_id, n_grams, gram-hash) rows —
    *     8-byte xxhash64 fingerprints, never gram strings, never text
    *     (the family invariant; the oracle joins the gram strings
    *     themselves, identical modulo ~2⁻⁶⁴ collisions, same contract
    *     as minhash/PPJoin's hashed-token joins);
    *  3. benchmark grams deduplicate to one hash column (a benchmark
    *     is eval-set-sized — AQE broadcasts it when small enough, and
    *     the join degrades to a hash-partitioned one, not a failure,
    *     when it is not);
    *  4. one left join + one count aggregation: `hits` counts matched
    *     DISTINCT grams because step 1 deduplicated per doc and the
    *     benchmark side is globally distinct — no fanout.
    */
  def ngramOverlapFraction(corpus: DataFrame, bench: DataFrame,
                           idCol: String, textCol: String,
                           n: Int = 5): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    // ScanFanOut (r20, guide §2.5): tokenize → n-grams → explode → hash
    // is a narrow CPU-dense chain from the scan, so a few-file input
    // runs it serially (measured on q108: 5 single-task stages,
    // wall ≈ task CPU). One (id, text) exchange buys full width.
    def grams(df: DataFrame): DataFrame =
      ScanFanOut(df.select(col(idCol), col(textCol))).select(
        col(idCol).as("doc_id"),
        array_distinct(graft.functions.TextFunctions.wordNgrams(
          graft.functions.TextFunctions.tokenize(lower(col(textCol))), n)).as("grams"))
    val docG = grams(corpus).filter(size(col("grams")) > 0)
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("g"))
      .select(col("doc_id"), col("n_grams"), xxhash64(col("g")).as("gh"))
    val benchG = grams(bench)
      .select(explode(col("grams")).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
      .withColumn("m", lit(1L))
    docG.join(benchG, Seq("gh"), "left")
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(sum(coalesce(col("m"), lit(0L))).as("hits"))
      .withColumn("frac_e4",
        floor(col("hits").cast("double") / col("n_grams") * lit(10000.0)).cast("long"))
  }

  /** SUBSTRING-level multi-pattern scan (r17) — the Aho–Corasick face
    * of the family: which of N literal strings occur ANYWHERE inside
    * each document, with occurrence counts (overlapping occurrences
    * each count). The exact gates match whole keys, the n-gram gate
    * measures token-mass overlap; this is what catches a benchmark
    * answer string pasted mid-paragraph, a canary, or a banned phrase
    * regardless of tokenization.
    *
    * Returns (doc_id, pattern, n_hits) with n_hits ≥ 1 rows only.
    *
    * Shape at 100 TB: the pattern set compiles ONCE into a driver-side
    * automaton riding the expression ([[org.apache.spark.sql.graft.MultiPatternHits]]
    * — kilobytes per thousand short patterns); each row pays ONE
    * O(|text|) codegen'd pass regardless of N (N × `contains` would
    * pay N passes); the expression's output is HIT-SIZED (index,
    * count) pairs, so the explode and everything downstream never
    * scale with the dictionary — a clean corpus row carries an empty
    * array. Zero shuffles, zero joins — a pure map the scan pipeline
    * fuses with its read.
    */
  def multiPatternHits(corpus: DataFrame, idCol: String, textCol: String,
                       patterns: Seq[String]): DataFrame = {
    val names = array(patterns.map(lit): _*)
    corpus.select(col(idCol).as("doc_id"),
        org.apache.spark.sql.graft.PatternExpressions
          .multiPatternHits(col(textCol), patterns).as("hits"))
      .select(col("doc_id"), explode(col("hits")).as("h"))
      .select(col("doc_id"),
        element_at(names, col("h.i") + 1).as("pattern"),
        col("h.n").as("n_hits"))
  }

  /** The gating face of [[multiPatternHits]]: drop every document in
    * which ANY pattern occurs (first-hit early exit per row, no count
    * array, no explode — the clean-corpus fast path).
    */
  def multiPatternFilter(corpus: DataFrame, textCol: String,
                         patterns: Seq[String]): DataFrame =
    corpus.filter(!org.apache.spark.sql.graft.PatternExpressions
      .multiPatternAny(col(textCol), patterns))

  /** The redaction face: keep every document, remove every character
    * covered by any pattern occurrence (mask-union — overlapping and
    * nested occurrences compose order-free, no leftmost-longest tie
    * rule to disagree about). The multi-literal sibling of
    * [[graft.functions.TextFunctions.redactPii]]'s regex classes:
    * banned phrases, canary strings, dictionary-known PII. Returns
    * (doc_id, scrub_text, n_removed); same pure-map zero-exchange
    * shape as the other faces, with the clean-document fast path
    * returning the input string unallocated.
    */
  def multiPatternScrub(corpus: DataFrame, idCol: String, textCol: String,
                        patterns: Seq[String]): DataFrame =
    // project the scrub ONCE, derive n_removed from the projected
    // column in a second select (ADVICE r17: referencing the scrub
    // expression twice left the single-pass cost claim at the mercy
    // of subexpression elimination; CollapseProject keeps the split
    // because scrub_text is consumed twice above it)
    corpus.select(col(idCol).as("doc_id"),
        length(col(textCol)).cast("long").as("__n_orig"),
        org.apache.spark.sql.graft.PatternExpressions
          .multiPatternScrub(col(textCol), patterns).as("scrub_text"))
      .select(col("doc_id"), col("scrub_text"),
        (col("__n_orig") - length(col("scrub_text"))).as("n_removed"))
}
