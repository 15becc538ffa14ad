package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Trained discriminative quality classifier — the third leg of the
  * scoring family (generative LM perplexity = [[LmScore.bigramScore]],
  * importance ratio = [[LmScore.importanceScore]] / DSIR, and this: a
  * trained classifier over bag-of-token features, the CCNet/GPT-3
  * recipe's "quality filter trained on a curated positive set").
  *
  * The model is logistic regression in e6 FIXED-POINT integer
  * arithmetic, trained by full-batch gradient descent with a
  * hard-sigmoid link (Collobert's HardSigmoid / BinaryConnect's
  * piecewise-linear σ approximation):
  *   σ̂(z) = clamp(z/4 + 1/2, 0, 1)   — in e6 units:
  *   p_e6  = clamp(fdiv(z_e6, 4) + 500000, 0, 1000000)
  * where every division is FLOOR division computed as
  * `(a − pmod(a, b)) / b` (exactly divisible, so the engine's own
  * division semantics can't leak in — DuckDB's `//` truncates toward
  * zero like Spark's `div`, and both replay this identically). With
  * integer counts, integer weights, and the piecewise-linear link,
  * TRAINING ITSELF is exact integer arithmetic — the Kmeans/PageRank
  * doctrine applied to gradient descent: every round's weight table is
  * oracle-replayable as an unrolled SQL CTE, so the correctness gate
  * covers the training loop, not just the scoring pass.
  *
  * Per round r:
  *   z_e6(doc)  = b_r + Σ_w cnt(doc,w) · W_r(w)
  *   err_e6(doc) = p_e6(doc) − 10⁶·y(doc)
  *   grad(w)     = Σ_docs err_e6(doc) · cnt(doc,w);  gradB = Σ err_e6
  *   W_{r+1}(w)  = W_r(w) − fdiv(grad(w), G);  b_{r+1} = b_r − fdiv(gradB, G)
  * with G = gMul · n_train — the fixed-point learning rate 1/(gMul·n)
  * (gMul 16 is stable; 4 diverges on the gated fixture — the q192
  * gate's calibration run records both).
  *
  * Shape at 100 TB: the token-count frame is built ONCE and persisted
  * (hash-keyed — text never enters an exchange, the family invariant);
  * each round costs one doc-keyed exchange (the margin sum, map-side
  * combinable) + one vocab-keyed exchange (the gradient sum) + one
  * vocab-sized join. The model is ONE vocab-sized (h, w_e6) table plus
  * a scalar bias — the standing-artifact shape (train once on the
  * labeled set, score every incoming batch). Per-round driver traffic
  * is ONE scalar (the bias gradient) — the BpeTrain model-update
  * contract. Features are per-distinct-token; a 100 TB vocabulary
  * would bucket them (`pmod(xxhash64(w), 2²⁰)` — the hashing trick,
  * Weinberger et al. 2009) with zero change to the arithmetic; the
  * unbucketed form is what the string-keyed oracle can replay.
  *
  * Contract: docs with zero tokens carry no features and are absent
  * from training and scoring (the [[LmScore.scoreWithModel]] absence
  * contract); n_train counts TOKENIZED docs.
  */
object QualityClassifier {

  /** A trained model: `w` = (h, w_e6) per-token-hash weights
    * (vocab-sized, parquet-stable), plus the scalar bias. */
  final case class LogisticModel(w: DataFrame, biasE6: Long)

  /** Floor division as exact integer arithmetic: pmod is non-negative,
    * so (a − pmod(a,b)) is exactly divisible by b and the double
    * division below is exact for |quotient| < 2⁵³ (gradients here are
    * ≤ 10⁶·corpus tokens ≈ 10¹⁷ at 100 TB — split the div before the
    * sum if that ceiling is ever approached; at gated scales ≤ 10¹³).
    */
  private def fdiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  private def clampP(zE6: Column): Column =
    greatest(lit(0L), least(lit(1000000L), fdiv(zE6, lit(4L)) + lit(500000L)))

  /** (doc_id, y?, h, c) token-count features. `nBuckets > 0` applies
    * the hashing trick (Weinberger et al. 2009): feature id =
    * pmod(xxhash64(w), nBuckets) — the 100 TB vocabulary dial, bounding
    * the model table at nBuckets rows with zero change to the training
    * arithmetic (collisions merge features, the standard trade).
    *
    * PUBLIC as the classifier's ADDITIVE sufficient statistic (r19):
    * the frame is per-doc rows, so disjoint document batches compose
    * by plain union — [[graft.streaming.LrIngest]] maintains it as a
    * standing table per micro-batch, and
    * [[trainLogisticFromCounts]] over the standing table is
    * byte-equal to [[trainLogistic]] over every document ever
    * ingested (spec-gated). A retrain after corpus growth or drift
    * therefore re-tokenizes NOTHING — it reads counts.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  labelCol: Option[String], nBuckets: Long = 0L): DataFrame =
    features(df, idCol, textCol, labelCol, nBuckets)

  private def features(df: DataFrame, idCol: String, textCol: String,
                       labelCol: Option[String], nBuckets: Long): DataFrame = {
    val hcol = if (nBuckets > 0L) pmod(xxhash64(col("w")), lit(nBuckets))
               else xxhash64(col("w"))
    // NOT fanned out (r20, measured): fanning the tokenize→explode→
    // count chain to defaultParallelism multiplied the classifier
    // family's task CPU ~2× (q196: 25 s → 58 s across +127 tasks,
    // ~0.26 s/task of per-task fixed cost) and moved every gate's wall
    // UP ~1 s — the plain tokenize here is too cheap per row to pay
    // the fan-out's per-task overhead. Contrast ngramOverlapFraction
    // (5-gram building) and the cosine pair scoring, where the same
    // fan-out wins 1.3–2.6 s.
    val base = df.select(
      col(idCol).as("doc_id") +:
        labelCol.map(l => col(l).cast("long").as("y")).toSeq :+
        explode(TextFunctions.tokenize(lower(col(textCol)))).as("w"): _*)
    base.groupBy((col("doc_id") +: labelCol.map(_ => col("y")).toSeq) :+
        hcol.as("h"): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Train on `train` (labelCol must be 0/1). Returns the standing
    * model. Weights start at zero over the TRAIN vocabulary — round 1
    * is the pure class-balance step (z ≡ 0, p ≡ ½).
    */
  def trainLogistic(train: DataFrame, idCol: String, textCol: String,
                    labelCol: String, rounds: Int = 2,
                    gMul: Long = 16L, nBuckets: Long = 0L): LogisticModel =
    trainLogisticFromCounts(
      features(train, idCol, textCol, Some(labelCol), nBuckets),
      rounds, gMul)

  /** Train from an already-materialized (doc_id, y, h, c) count frame
    * — the standing-table face ([[tokenCounts]] additivity): a retrain
    * from maintained counts is byte-equal to a from-scratch train and
    * skips the corpus tokenize entirely. Same arithmetic, same cost
    * shape minus the one corpus pass.
    */
  def trainLogisticFromCounts(counts: DataFrame, rounds: Int = 2,
                              gMul: Long = 16L): LogisticModel = {
    require(rounds >= 1, "need at least one round")
    require(gMul >= 1L, "gMul must be positive")
    val cnts = CacheScope.persist(
      counts.select(col("doc_id"), col("y"), col("h"), col("c")))
    val n = cnts.select(col("doc_id")).distinct().count()
    require(n > 0, "empty (or untokenizable) training set")
    val g = lit(gMul * n)
    // weights start at zero, so round 1's margin is the constant bias
    // — the vocab join and margin exchange are skipped until a real
    // weight table exists (value-identical: z ≡ b, the same shortcut
    // the oracle's e1 CTE takes)
    var w: Option[DataFrame] = None
    var b = 0L
    for (_ <- 1 to rounds) {
      val err = w match {
        case Some(wt) =>
          cnts.join(wt, Seq("h"))
            .groupBy(col("doc_id"), col("y"))
            .agg((lit(b) + sum(col("c") * col("w_e6"))).as("z_e6"))
            .select(col("doc_id"),
              (clampP(col("z_e6")) - lit(1000000L) * col("y")).as("e"))
        case None =>
          cnts.select(col("doc_id"), col("y")).distinct()
            .select(col("doc_id"),
              (clampP(lit(b)) - lit(1000000L) * col("y")).as("e"))
      }
      // persisted: consumed by the vocab gradient AND the scalar bias
      // gradient below — unpersisted it would re-run the margin pass
      val errP = CacheScope.persist(err)
      val grad = cnts.join(errP, Seq("doc_id"))
        .groupBy(col("h")).agg(sum(col("e") * col("c")).as("gr"))
      // grad covers the full train vocabulary (every token row joins
      // its doc's error), so round 1's table IS the vocab; later
      // rounds left-join for shape-safety — a missing row is a 0 step
      w = Some(CacheScope.persist(w match {
        case Some(wt) => wt.join(grad, Seq("h"), "left")
          .select(col("h"),
            (col("w_e6") - fdiv(coalesce(col("gr"), lit(0L)), g)).as("w_e6"))
        case None => grad.select(col("h"),
          (-fdiv(col("gr"), g)).as("w_e6"))
      }))
      // the ONE driver-side scalar per round (BpeTrain contract)
      val gb = errP.agg(coalesce(sum(col("e")), lit(0L))).head().getLong(0)
      b = b - Math.floorDiv(gb, gMul * n)
    }
    LogisticModel(w.get, b)
  }

  /** Score `docs` against a standing model: (doc_id, z_e6, p_e6, pred)
    * — pred is the p ≥ ½ decision. Tokens outside the model vocabulary
    * contribute zero (unseen-feature contract of the hashing-trick
    * family).
    */
  def scoreLogistic(docs: DataFrame, model: LogisticModel, idCol: String,
                    textCol: String, nBuckets: Long = 0L): DataFrame =
    features(docs, idCol, textCol, None, nBuckets)
      .join(model.w, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg((lit(model.biasE6) +
        sum(col("c") * coalesce(col("w_e6"), lit(0L)))).as("z_e6"))
      .select(col("doc_id"), col("z_e6"), clampP(col("z_e6")).as("p_e6"),
        (clampP(col("z_e6")) >= lit(500000L)).as("pred"))

  /** Score-distribution DRIFT statistic over a [[scoreLogistic]] output
    * (the q149 treatment for the standing [[LogisticModel]]): mean
    * decision confidence in e6 — fdiv(Σ|p_e6 − ½·10⁶|, n), exact
    * integer arithmetic. A model whose discriminative features have
    * left the incoming corpus (vocabulary drift — the production
    * failure a standing text classifier actually suffers) scores
    * everything near the bias, so confidence COLLAPSES, label-free:
    * the detector needs no ground truth on the new data, just the
    * score distribution. One row: (n_scored, conf_e6). The retrain
    * trigger compares this against the model's accepted baseline —
    * the gate convention is `new·2 < base` (halved confidence),
    * mirroring the PQ drift gate's ratio shape.
    */
  def scoreConfidenceE6(scored: DataFrame): DataFrame =
    scored.agg(count(lit(1)).as("n_scored"),
        coalesce(sum(abs(col("p_e6") - lit(500000L))), lit(0L)).as("s"))
      .select(col("n_scored"),
        when(col("n_scored") === 0L, lit(0L))
          .otherwise(fdiv(col("s"), col("n_scored"))).as("conf_e6"))
}
