package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Language-model quality scoring: score every document by its mean
  * log-probability under an n-gram model trained on a REFERENCE corpus
  * — the CCNet/Gopher web-filtering recipe ("keep what looks like
  * Wikipedia"), and the quality-gate counterpart of the surface-statistic
  * gates (q21/q69): those ask "is this well-formed text", this asks "is
  * this text DISTRIBUTED like the reference".
  *
  * The model is a bigram Stupid Backoff (Brants et al. 2007 — the
  * large-scale variant that needs no discounting renormalization):
  *   P(w2|w1) = cb(w1,w2)/cu(w1)            if the bigram was seen,
  *            = alpha · (cu(w2)+1)/(N+V)     otherwise
  * (add-one-smoothed unigram backoff, so unseen words score a floor
  * probability instead of −∞). Per position: lnp_e6 = ⌊10⁶·ln P⌋.
  * Documents report the SUM and the position count, not the mean —
  * integer division truncates toward zero in Spark and floors in
  * DuckDB, so the mean is the consumer's one double op.
  *
  * Shape at 100 TB:
  *  - train: two aggregations over the reference corpus + one
  *    vocab-sized join folding cu(w1) INTO the bigram table, so
  *    scoring's hit branch needs no second lookup;
  *  - score: tokens and bigram strings exist only map-side — the
  *    positions frame enters its exchanges as (doc_id, 3×8-byte
  *    xxhash64 keys) (the family invariant: text never shuffles);
  *  - one left join against the bigram table (hit branch) + one
  *    against the unigram table (backoff operands), then a
  *    map-side-combinable per-doc integer sum. No windows, no
  *    position-sized caches — single pass.
  *
  * Engine portability (the DuckDB oracle replays string-keyed what
  * Spark computes hash-keyed — the q108 hashed-token contract): every
  * float op is a correctly-rounded IEEE double op over identical
  * operands in identical association order except the single `ln`,
  * e6-floored per position; a last-ulp libm disagreement flips a
  * result only if 10⁶·ln(p) sits within ~1e-9 of an integer for one
  * of the distinct probability values (`LmScoreSpec` measures the
  * minimum margin on the gated corpus).
  */
object LmScore {

  /** A trained bigram model: `uni` = (h, cu) token-hash counts, `bi` =
    * (h12, cb, cu1) gram-hash counts carrying their own denominator,
    * plus the corpus constants. Both frames are model-sized (vocab /
    * bigram-vocab rows, 24 bytes each) and round-trip through parquet
    * unchanged — the nightly-artifact shape (the q57 minhash-index
    * contract): train once, score every recurring batch against the
    * standing tables.
    */
  final case class BigramModel(uni: DataFrame, bi: DataFrame,
                               nTokens: Long, vocab: Long)

  // NOT fanned out (r20, measured): the plain tokenize is too cheap per
  // row to pay the fan-out exchange's per-task overhead — the fanned
  // variant moved q183 1.13 s → 3.25 s (task CPU 1.8 s → 33 s) and the
  // whole LM/DSIR family up 1–2 s each. See QualityClassifier.features.
  private def toks(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol).as("doc_id"),
      TextFunctions.tokenize(lower(col(textCol))).as("toks"))

  private def bigrams(df: DataFrame, idCol: String, textCol: String) =
    bigramsFromToks(toks(df, idCol, textCol))

  private def bigramsFromToks(t: DataFrame) =
    t.select(col("doc_id"), explode(TextFunctions.wordNgrams(col("toks"), 2)).as("gram"))
      .select(col("doc_id"),
        substring_index(col("gram"), " ", 1).as("w1"),
        substring_index(col("gram"), " ", -1).as("w2"),
        col("gram"))

  /** Train the model: unigram counts (+N, V) and a bigram table that
    * carries its own denominator, so scoring's hit branch needs no
    * second lookup. `uni` is persisted (three consumers: the stats
    * aggregate, the bigram-denominator join, and every scoring join;
    * lifecycle: CacheScope.release).
    */
  def trainBigramModel(ref: DataFrame, idCol: String,
                       textCol: String): BigramModel =
    modelFromCounts(unigramCounts(ref, idCol, textCol),
      bigramCounts(ref, idCol, textCol))

  /** The model's ADDITIVE sufficient statistics, slice form (r17 —
    * the Bm25Ingest decomposition applied to the LM family): an n-gram
    * model is nothing but count tables, and counts over disjoint
    * document slices SUM to the counts over the union. So a standing
    * reference model is maintainable by appending per-batch
    * [[unigramCounts]]/[[bigramCounts]] rows and re-summing in
    * [[modelFromCounts]] — byte-equal to retraining on the union
    * corpus (q183 gates it; streaming face: graft.streaming.LmIngest).
    */
  def unigramCounts(ref: DataFrame, idCol: String, textCol: String): DataFrame =
    unigramCountsFromToks(toks(ref, idCol, textCol))

  /** Bigram slice counts (h12, h1, cb) — h1 rides along so the merge
    * can fold the unigram denominator in without re-reading text.
    */
  def bigramCounts(ref: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramCountsFromToks(toks(ref, idCol, textCol))

  /** The tokenized frame (doc_id, toks) both count builders consume —
    * exposed package-private so a sink that needs BOTH counts from
    * one batch (LmIngest) can tokenize once, persist the token frame,
    * and share it.
    */
  private[graft] def tokFrame(df: DataFrame, idCol: String,
                              textCol: String): DataFrame =
    toks(df, idCol, textCol)

  private[graft] def unigramCountsFromToks(t: DataFrame): DataFrame =
    t.select(explode(col("toks")).as("w"))
      .groupBy(xxhash64(col("w")).as("h")).agg(count(lit(1)).as("cu"))

  private[graft] def bigramCountsFromToks(t: DataFrame): DataFrame =
    bigramsFromToks(t)
      .groupBy(xxhash64(col("gram")).as("h12"), xxhash64(col("w1")).as("h1"))
      .agg(count(lit(1)).as("cb"))

  /** Assemble a [[BigramModel]] from (possibly multi-slice) count
    * frames: sum per key, then fold the unigram denominator into the
    * bigram table. With single-slice inputs this IS the original
    * one-shot training (same values, the q113 oracle's gate); with
    * appended slices it is the incremental-maintenance read path.
    */
  def modelFromCounts(uniParts: DataFrame, biParts: DataFrame): BigramModel = {
    val uni = CacheScope.persist(
      uniParts.groupBy(col("h")).agg(sum(col("cu")).as("cu")))
    val stats = uni.agg(sum(col("cu")), count(lit(1))).head()
    // sum over an EMPTY frame is NULL — check before getLong, or the
    // intended diagnostic below becomes an opaque NPE
    require(!stats.isNullAt(0), "empty reference corpus")
    val nTokens = stats.getLong(0)
    val vocab = stats.getLong(1)
    require(nTokens > 0, "empty reference corpus")
    // persisted like uni: bi's lineage is the full reference tokenize +
    // aggregate — unpersisted, every recurring scoreWithModel call (the
    // streaming lmGate's per-batch join) would re-train the model
    val bi = CacheScope.persist(
      biParts.groupBy(col("h12"), col("h1")).agg(sum(col("cb")).as("cb"))
        .join(uni.withColumnRenamed("h", "h1").withColumnRenamed("cu", "cu1"), "h1")
        .select(col("h12"), col("cb"), col("cu1")))
    BigramModel(uni, bi, nTokens, vocab)
  }

  /** Score `docs` against a standing [[BigramModel]] — strings drop
    * before any exchange; hashes join. Same output contract as
    * [[bigramScore]].
    */
  def scoreWithModel(docs: DataFrame, model: BigramModel, idCol: String,
                     textCol: String, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val nv = (model.nTokens + model.vocab).toDouble
    val pos = bigrams(docs, idCol, textCol).select(col("doc_id"),
      xxhash64(col("gram")).as("h12"), xxhash64(col("w2")).as("h2"))
    val backoff = pos.join(model.bi, Seq("h12"), "left")
      .join(model.uni.withColumnRenamed("h", "h2").withColumnRenamed("cu", "cu2"),
        Seq("h2"), "left")
    val lnp = when(col("cb").isNotNull,
        log(col("cb").cast("double") / col("cu1").cast("double")))
      .otherwise(log(lit(alpha) *
        ((coalesce(col("cu2"), lit(0L)) + lit(1L)).cast("double") / lit(nv))))
    backoff
      .withColumn("lnp_e6", floor(lit(1000000.0) * lnp).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("lnp_e6")).as("ll_e6"), count(lit(1)).as("n_pos"),
        sum(when(col("cb").isNull, 1L).otherwise(0L)).as("n_backoff"))
  }

  /** Score `docs` under a bigram Stupid-Backoff model trained on
    * `ref`. Returns (doc_id, ll_e6, n_pos, n_backoff): summed
    * ⌊10⁶·ln P⌋ over the doc's bigram positions, the position count,
    * and how many positions fell to the unigram backoff (a high
    * backoff share flags out-of-domain text even when ll_e6 is mild).
    * Documents with fewer than 2 tokens have no positions and are
    * absent from the output. One-shot form of
    * [[trainBigramModel]]+[[scoreWithModel]] — a recurring pipeline
    * should train once and keep the model tables standing.
    */
  def bigramScore(docs: DataFrame, ref: DataFrame, idCol: String,
                  textCol: String, alpha: Double = 0.4): DataFrame =
    scoreWithModel(docs, trainBigramModel(ref, idCol, textCol),
      idCol, textCol, alpha)

  /** CCNet-style PER-GROUP score bucketing (Wenzek et al. 2020): split
    * each group (typically language) into head/middle/tail by rank
    * position under a score column — the curation step that follows
    * [[bigramScore]] (score docs against a clean reference LM, keep
    * the head, maybe sample the middle, drop the tail). Score-agnostic
    * on purpose: any deterministic quality column buckets the same
    * way.
    *
    * Contract: rank within the group by (score DESC NULLS LAST,
    * id ASC) — higher score = better = head, null scores sink to the
    * tail, ties are id-deterministic. With group size n, a row at
    * 1-based rank p gets `labels(j)` for the first cut c_j (ascending
    * e6 fractions) with p ≤ ⌈c_j·n/10⁶⌉ — the same integer-ceil rank
    * arithmetic as [[Profile.quantiles]], zero float ops.
    *
    * Scale shape: ONE shuffle on the group key; both the rank and the
    * group count share the window sort. Groups are languages —
    * hundreds at most, but Zipf-heavy (English can be half the
    * corpus), so the per-group sort is the audit-mode cost; the 100 TB
    * production path derives per-group score THRESHOLDS once (e.g.
    * [[Profile.quantiles]] per group, a model-sized table) and buckets
    * map-side with a broadcast join — same outputs when scores are
    * distinct at the cut, and no corpus-wide sort. AQE's skew handling
    * does not split a window partition, so the threshold path is the
    * dial for a one-language corpus.
    *
    * Output: idCol, groupCols…, rank_in_group, n_in_group, bucket.
    */
  def perplexityBuckets(scored: DataFrame, groupCols: Seq[String],
                        idCol: String, scoreCol: String,
                        cutsE6: Seq[Long] = Seq(333333L, 666667L),
                        labels: Seq[String] =
                          Seq("head", "middle", "tail")): DataFrame = {
    require(labels.size == cutsE6.size + 1,
      "need one more label than cuts")
    require(cutsE6 == cutsE6.sorted && cutsE6.forall(c =>
      c > 0 && c < 1000000L), "cuts must be ascending e6 fractions")
    val gw = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol).asc)
    val cw = Window.partitionBy(groupCols.map(col): _*)
    val withRank = scored
      .select((col(idCol) +: groupCols.map(col)) :+ col(scoreCol): _*)
      .withColumn("rank_in_group", row_number().over(gw).cast("long"))
      .withColumn("n_in_group", count(lit(1)).over(cw))
    val bucket = cutsE6.zip(labels.init).foldRight(
      lit(labels.last): Column) { case ((c, lab), els) =>
      when(col("rank_in_group") <=
        expr(s"(${c}L * n_in_group + 999999L) div 1000000L"), lab)
        .otherwise(els)
    }
    withRank.select((col(idCol) +: groupCols.map(col)) :+
      col("rank_in_group") :+ col("n_in_group") :+
      bucket.as("bucket"): _*)
  }

  // ————— DSIR importance scoring (r17) —————

  /** A trained importance model (DSIR — Xie et al., NeurIPS 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * `lam` = (h, lam_e6) per-token log-ratio weights between the
    * TARGET distribution (what you want more of — the Wikipedia/books
    * side of the published recipe) and the RAW distribution (the
    * uncurated pool being selected from), both add-one smoothed over
    * the UNION vocabulary; `lamUnseenE6` is the weight of a token
    * absent from both sides (new-document scoring). Vocab-sized,
    * parquet-stable — the standing-artifact shape (train once against
    * a fixed target, score every incoming raw batch).
    */
  final case class ImportanceModel(lam: DataFrame, lamUnseenE6: Long)

  /** Train the per-token log-ratio table:
    *   lam_e6(w) = ⌊10⁶·ln((c_t(w)+1)/(N_t+V))⌋ − ⌊10⁶·ln((c_r(w)+1)/(N_r+V))⌋
    * with V = |vocab(target) ∪ vocab(raw)| (one smoothing universe, so
    * both sides are proper distributions over the same support). Each
    * ln is e6-floored SEPARATELY — the per-operand flooring that lets
    * the oracle replay both libm calls on identical operands (the
    * q113 contract), and makes per-position and per-distinct-token
    * accumulation provably equal (the weight is a per-token constant).
    *
    * Shape at 100 TB: two token-count aggregations (map-side
    * combinable, hash-keyed — text never shuffles), one vocab-sized
    * full outer join, three scalar constants. The model is the join
    * artifact; nothing corpus-sized survives.
    */
  def trainImportanceModel(target: DataFrame, raw: DataFrame,
                           idCol: String, textCol: String): ImportanceModel =
    importanceModelFromCounts(unigramCounts(target, idCol, textCol),
      unigramCounts(raw, idCol, textCol))

  /** Assemble an [[ImportanceModel]] from (possibly multi-slice)
    * unigram-count frames ([[unigramCounts]]' (h, cu) shape) — the
    * additive face of DSIR: the TARGET is a fixed curation asset, but
    * the RAW pool GROWS with every ingest batch, and its counts sum,
    * so the standing model is maintainable by appending per-batch
    * count rows (the LmIngest unigram table serves directly) and
    * re-deriving the λ table at refresh — byte-equal to retraining on
    * the union pool (q188 gates it under q182's oracle verbatim).
    * Model-sized work at refresh; the pool's text is never
    * re-tokenized.
    */
  def importanceModelFromCounts(targetCounts: DataFrame,
                                rawCounts: DataFrame): ImportanceModel = {
    def summed(parts: DataFrame) =
      parts.groupBy(col("h")).agg(sum(col("cu")).as("c"))
    val ct = CacheScope.persist(summed(targetCounts))
    val cr = CacheScope.persist(summed(rawCounts))
    val tStats = ct.agg(coalesce(sum(col("c")), lit(0L)), count(lit(1))).head()
    val rStats = cr.agg(coalesce(sum(col("c")), lit(0L)), count(lit(1))).head()
    val nt = tStats.getLong(0)
    val nr = rStats.getLong(0)
    require(nt > 0, "empty target corpus")
    require(nr > 0, "empty raw corpus")
    val vocab = ct.select(col("h")).unionByName(cr.select(col("h")))
      .distinct().count()
    def lnFloorE6(cCol: Column, denom: Double): Column =
      floor(lit(1000000.0) *
        log((cCol + lit(1L)).cast("double") / lit(denom))).cast("long")
    val dt = (nt + vocab).toDouble
    val dr = (nr + vocab).toDouble
    val lam = ct.withColumnRenamed("c", "ct")
      .join(cr.withColumnRenamed("c", "cr"), Seq("h"), "full_outer")
      .select(col("h"),
        (lnFloorE6(coalesce(col("ct"), lit(0L)), dt) -
          lnFloorE6(coalesce(col("cr"), lit(0L)), dr)).as("lam_e6"))
    val unseen = (math.floor(1000000.0 * math.log(1.0 / dt)) -
      math.floor(1000000.0 * math.log(1.0 / dr))).toLong
    ImportanceModel(CacheScope.persist(lam), unseen)
  }

  /** Score `docs` against a standing [[ImportanceModel]]: per document
    * the summed per-position weight
    *   dsir_e6 = Σ_positions lam_e6(w)
    * plus the position count (the consumer's length normalizer, if it
    * wants one — raw DSIR resamples by the unnormalized weight) and
    * how many positions fell to the unseen constant. Zero-token
    * documents have no positions and are absent — same absence
    * contract as [[scoreWithModel]].
    *
    * Downstream, selection composes with the existing machinery
    * instead of duplicating it: rank/top-fraction per group =
    * [[perplexityBuckets]]; fixed-size or budgeted draws =
    * `Sampling.capPerStratum`/`tokenBudgetSample` ordered by the
    * score. One exchange (the per-doc sum), one vocab-sized join that
    * AQE broadcasts at production vocab sizes.
    */
  def importanceWithModel(docs: DataFrame, model: ImportanceModel,
                          idCol: String, textCol: String): DataFrame =
    toks(docs, idCol, textCol)
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
      .join(model.lam, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("lam_e6"), lit(model.lamUnseenE6))).as("dsir_e6"),
        count(lit(1)).as("n_pos"),
        sum(when(col("lam_e6").isNull, 1L).otherwise(0L)).as("n_unseen"))

  /** One-shot form: train on (target, raw), score `docs`. The
    * published selection recipe scores the raw pool itself —
    * `importanceScore(rawPool, target, rawPool, …)` — then resamples
    * by the weight.
    */
  def importanceScore(docs: DataFrame, target: DataFrame, raw: DataFrame,
                      idCol: String, textCol: String): DataFrame =
    importanceWithModel(docs, trainImportanceModel(target, raw, idCol, textCol),
      idCol, textCol)
}
