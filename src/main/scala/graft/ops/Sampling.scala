package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * The property that matters at 100 TB is REPRODUCIBILITY WITHOUT
  * STATE: a train/val/test assignment must be a pure function of the
  * row's id — never `rand()` (changes across retries, partitionings,
  * and engine versions) and never a materialized assignment table
  * (another 10^10-row join). Every operator here is a deterministic
  * column expression: narrow, codegen'd, shuffle-free for the split
  * case, and stable under repartition/recompute by construction.
  *
  * Two id-mixing flavors:
  *  - [[hashBucket]]: `xxhash64` — full 64-bit avalanche, the
  *    production default.
  *  - [[portableBucket]]: multiplicative-mod mixing in plain BIGINT
  *    arithmetic, reproducible in ANY engine with 64-bit integer math
  *    (the cross-engine audit path; also what the DuckDB oracle
  *    replays). Ids congruent mod 1,000,003 collide into one bucket
  *    stream — irrelevant for sampling quality below ~10^9 ids; above
  *    that, use [[hashBucket]].
  */
object Sampling {

  /** Mix an integer id into [0, nBuckets) with xxhash64. */
  def hashBucket(id: Column, nBuckets: Int): Column =
    pmod(xxhash64(id), lit(nBuckets.toLong))

  /** Engine-portable raw mix: ((id mod 1000003) * 2654435761) mod
    * 1000000007 — every term stays below 2^63 (max ~2.65e15), so the
    * arithmetic is exact in any 64-bit engine: no overflow even under
    * ANSI mode, no float rounding.
    */
  def portableMix(id: Column): Column =
    pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(1000000007L))

  /** [[portableMix]] folded into [0, nBuckets). */
  def portableBucket(id: Column, nBuckets: Int): Column =
    pmod(portableMix(id), lit(nBuckets.toLong))

  /** High-resolution engine-portable mix: two independent
    * multiplicative residue mixes over near-2^31 primes, combined into
    * one value in [0, ~2^62). Period = lcm(2147483647, 2147483629)
    * ≈ 4.6×10^18, so distinct ids keep distinct mix streams far past
    * any real corpus size — this is the u-source for samplers whose
    * QUALITY depends on u's resolution ([[weightedSample]]'s A-ES
    * keys), where [[portableMix]]'s ~10^6-period would make same-class
    * ids tie systematically. Every intermediate stays below 2^63
    * (largest: 2147483646·2654435761 ≈ 5.7×10^18), so the arithmetic
    * is exact in any 64-bit-integer engine and the DuckDB oracle
    * replays it verbatim.
    */
  def portableMix62(id: Column): Column = {
    val m1 = pmod(pmod(id, lit(2147483647L)) * lit(2654435761L), lit(2147483629L))
    val m2 = pmod(pmod(id, lit(2147483629L)) * lit(2246822519L), lit(2147483647L))
    m1 * lit(2147483648L) + m2
  }

  /** The split label for an id as a standalone column expression:
    * cumulative weight ranges over a 1e6-bucket mix. Because the split
    * is a pure function of the id, a leakage/decontamination check can
    * compute BOTH sides' splits inline from the pair's ids — no join
    * against a materialized assignment table, ever.
    */
  def splitExpr(id: Column, weights: Seq[(String, Double)],
                portable: Boolean = false): Column = {
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val n = 1000000
    val b = if (portable) portableBucket(id, n) else hashBucket(id, n)
    val cuts = weights.scanLeft(0.0)(_ + _._2).map(c => (c * n).toLong)
    weights.zipWithIndex.foldRight(lit(weights.last._1)) {
      case (((name, _), i), els) =>
        if (i == weights.size - 1) els
        else when(b < lit(cuts(i + 1)), lit(name)).otherwise(els)
    }
  }

  /** Deterministic named split (train/val/test): [[splitExpr]] as a
    * `split` column. A row's split never changes across runs,
    * repartitions, or cluster sizes; no shuffle, no state.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  weights: Seq[(String, Double)],
                  portable: Boolean = false): DataFrame =
    df.withColumn("split", splitExpr(col(idCol), weights, portable))

  /** EXACT stratified sample: precisely ⌈fraction × |stratum|⌉ rows per
    * stratum, chosen by the deterministic id mix (ties broken by id) —
    * unlike `DataFrame.stat.sampleBy`, which is Bernoulli (approximate
    * counts, seed-sensitive across Spark versions). One shuffle on the
    * strata key (the window); at scale this is a windowed rank like any
    * per-group top-k, with `WindowGroupLimit` pushing the limit
    * map-side.
    *
    * Portable mixing keeps the selection replayable in other engines —
    * the DuckDB oracle for q60 re-derives the exact same row set.
    */
  def stratifiedSampleExact(df: DataFrame, strataCols: Seq[String],
                            idCol: String, fraction: Double,
                            portable: Boolean = true): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0)
    val mix = if (portable) portableBucket(col(idCol), 1000000007)
      else pmod(xxhash64(col(idCol)), lit(Long.MaxValue))
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(mix, col(idCol))
    val cw = Window.partitionBy(strataCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__ct", count(lit(1)).over(cw))
      .filter(col("__rn") <= ceil(col("__ct") * fraction))
      .drop("__rn", "__ct")
  }

  /** Cap each stratum at an ABSOLUTE row count (the web-corpus "at most
    * N documents per domain" policy): rows are ranked inside their
    * stratum by the deterministic id mix and the rank is cut at
    * `maxRows`. Which rows survive is stable across runs and engines —
    * a re-crawl that adds documents to a domain never evicts the
    * previously kept ones unless their mix order says so.
    */
  def capPerStratum(df: DataFrame, strataCols: Seq[String], idCol: String,
                    maxRows: Long, portable: Boolean = true): DataFrame = {
    require(maxRows > 0)
    val mix = if (portable) portableBucket(col(idCol), 1000000007)
      else pmod(xxhash64(col(idCol)), lit(Long.MaxValue))
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(mix, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxRows)
      .drop("__rn")
  }

  /** TOKEN-BUDGET sampling: per stratum, keep documents in the
    * deterministic mix order until a WEIGHT budget (token count, char
    * count, byte size) is exhausted — "build a 1B-token mix from this
    * corpus", the budget-shaped counterpart of [[capPerStratum]]'s
    * row-count cap. A row is kept iff its inclusive running weight in
    * the order (coarse-bucket asc, fine-mix asc, id asc) is ≤ `budget`.
    * Selection is a pure function of (id, weight distribution) — same
    * reproducibility contract as every sampler here.
    *
    * The naive shape is a per-stratum window cumsum — a full stratum
    * SORT of the corpus. This implementation is the distributed
    * prefix-sum selection instead:
    *  1. rows get a coarse bucket b = portable mix of id into
    *     `nBuckets` — pure function, zero shuffles;
    *  2. per-(stratum, bucket) weight sums aggregate map-side-
    *     combinably to a |strata|×nBuckets frame (model-sized), whose
    *     per-stratum EXCLUSIVE prefix sums locate the budget boundary;
    *  3. broadcast back: buckets that fit entirely
    *     (prefix + bucketSum ≤ budget) pass their rows MAP-SIDE; buckets
    *     past the budget (prefix > budget) drop map-side; only the ONE
    *     boundary bucket per stratum — ~1/nBuckets of the stratum —
    *     pays the exact window cumsum, offset by its prefix.
    * The corpus-sized sort disappears; what remains is a tiny agg
    * shuffle plus a window over stratum/nBuckets rows.
    *
    * Weights must be non-negative: a negative weight breaks the
    * monotonicity the bucket pruning relies on (enforced; the guard is
    * one codegen'd conjunct on the aggregation pass).
    */
  def tokenBudgetSample(df: DataFrame, strataCols: Seq[String], idCol: String,
                        weightCol: String, budget: Long,
                        nBuckets: Int = 1024): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(nBuckets >= 2, "need at least 2 buckets")
    val sk = strataCols.map(col)
    val b = portableBucket(col(idCol), nBuckets)
    val w = when(col(weightCol) >= 0, col(weightCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"negative or null weight in $weightCol for id "),
        coalesce(col(idCol).cast("string"), lit("null")))))
    // (stratum, bucket) totals + exclusive prefix — |strata|×nBuckets rows
    val bw = Window.partitionBy(sk: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // persisted: the fits leg and the boundary leg each re-reference the
    // stats — uncached, the narrow corpus aggregation pass would run
    // twice. |strata|×nBuckets rows. Lifecycle: CacheScope.release.
    val buckets = CacheScope.persist(
      df.select((sk :+ b.as("__b") :+ w.as("__w")): _*)
        .groupBy((sk :+ col("__b")): _*).agg(sum(col("__w")).as("__bsum"))
        .withColumn("__before", coalesce(sum(col("__bsum")).over(bw), lit(0L))))
    val joined = df.withColumn("__b", b)
      .join(broadcast(buckets), strataCols :+ "__b")
    // whole-bucket verdicts are map-side; only the boundary bucket sorts
    val fits = joined.filter(col("__before") + col("__bsum") <= budget)
    val iw = Window.partitionBy((sk :+ col("__b")): _*)
      .orderBy(portableBucket(col(idCol), 1000000007), col(idCol))
    val boundary = joined
      .filter(col("__before") <= budget && col("__before") + col("__bsum") > budget)
      .withColumn("__cum", col("__before") + sum(w).over(iw))
      .filter(col("__cum") <= budget)
      .drop("__cum")
    fits.unionByName(boundary).drop("__b", "__bsum", "__before")
  }

  /** Fractional-EPOCH upsampling — the data-mixing recipe stated as
    * "2.3 epochs of wiki, 0.6 of web" (GPT-3 Table 2.2, LLaMA Table 1):
    * every row of stratum s appears ⌊e_s⌋ times, plus once more for the
    * deterministic frac(e_s) subset, each copy tagged with a 0-based
    * `epoch` column (fold it into [[epochShuffleKey]] so copies land in
    * different shuffle positions downstream). Strata absent from the
    * map get 0 epochs — dropped, `sampleBy` semantics like
    * [[sampleByExact]].
    *
    * Engine-exact arithmetic: epochs are rounded to MILLI-epochs at the
    * driver, so the partial-copy cut is pure integer —
    * `(rank−1)·1000 < n_s·(e_s mod 1000)` ⟺ rank ≤ ⌈n_s·frac⌉ — and
    * replayable bit-for-bit by the oracle (a double `e − ⌊e⌋` residual
    * would flip rows where n·frac lands near an integer). The partial
    * subset is the SAME portable-mix rank selection as every exact
    * sampler here, so the frac(e) subset of a stratum is a PREFIX of
    * its [[sampleByExact]] selection — growing e never evicts a
    * previously kept copy.
    *
    * Shape: one window rank on the strata key (needed only for the
    * fractional cut; same single shuffle as [[stratifiedSampleExact]])
    * + one generator explode. Replication multiplies rows, never
    * widens them — at 100 TB, upsampling is a map-side row generator,
    * not a join against anything.
    */
  def epochUpsample(df: DataFrame, strataCol: String, idCol: String,
                    epochs: Map[String, Double],
                    portable: Boolean = true): DataFrame = {
    require(epochs.values.forall(e => e >= 0.0 && e <= 1000.0),
      "epochs must be in [0, 1000]")
    val milli = epochs.toSeq.sortBy(_._1)
      .map { case (k, e) => (k, math.round(e * 1000.0)) }
    val em = milli.foldLeft(lit(0L)) { case (els, (k, m)) =>
      when(col(strataCol) === lit(k), lit(m)).otherwise(els)
    }
    val mix = if (portable) portableBucket(col(idCol), 1000000007)
      else pmod(xxhash64(col(idCol)), lit(Long.MaxValue))
    val w = Window.partitionBy(col(strataCol)).orderBy(mix, col(idCol))
    val cw = Window.partitionBy(col(strataCol))
    // copies = ⌊e⌋ + (1 iff in the fractional prefix); sequence() needs
    // the guard — sequence(0, -1) is a DESCENDING range, not empty
    val nCopies = (col("__em") / 1000L).cast("long") +
      when((col("__rn") - 1L) * 1000L < col("__ct") * pmod(col("__em"), lit(1000L)),
        1L).otherwise(0L)
    df.withColumn("__em", em)
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__ct", count(lit(1)).over(cw))
      .withColumn("__nc", nCopies)
      .filter(col("__nc") >= 1L)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__nc") - 1L)))
      .drop("__em", "__rn", "__ct", "__nc")
  }

  /** Deterministic epoch-shuffle key: a training run orders the corpus
    * by this key instead of materializing a permutation — different
    * epochs get different (but each reproducible) orders by folding the
    * epoch into the portable mix before multiplying.
    */
  def epochShuffleKey(id: Column, epoch: Int): Column =
    // the epoch folds in AFTER the first pmod: `id + epoch` on the raw
    // column overflows under ANSI mode at Long.MaxValue
    pmod(pmod(pmod(id, lit(1000003L)) + lit(epoch.toLong % 1000003L),
      lit(1000003L)) * lit(2654435761L), lit(1000000007L))

  /** EXACT per-stratum sampling with a DIFFERENT fraction per stratum
    * value — dataset mixing: up-weight curated sources, down-weight web
    * crawl, drop unlisted strata (fraction 0, `sampleBy` semantics).
    * Same windowed-rank machinery as [[stratifiedSampleExact]]; the
    * fraction is a when-chain on the stratum value, so the whole mix
    * spec rides in the plan as literals — no fractions table, no join.
    */
  def sampleByExact(df: DataFrame, strataCol: String, idCol: String,
                    fractions: Map[String, Double],
                    portable: Boolean = true): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0))
    val frac = fractions.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (els, (k, f)) => when(col(strataCol) === lit(k), lit(f)).otherwise(els)
    }
    val mix = if (portable) portableBucket(col(idCol), 1000000007)
      else pmod(xxhash64(col(idCol)), lit(Long.MaxValue))
    val w = Window.partitionBy(col(strataCol)).orderBy(mix, col(idCol))
    val cw = Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__ct", count(lit(1)).over(cw))
      .filter(col("__rn") <= ceil(col("__ct") * frac))
      .drop("__rn", "__ct")
  }

  /** Temperature-based dataset mixing (the mT5/T5 multilingual recipe):
    * sample `target_i ∝ n_i^alpha` rows from each stratum, ~`totalN`
    * overall — alpha < 1 up-weights small strata (low-resource
    * languages) relative to proportional sampling, alpha = 0 is uniform
    * per stratum, alpha = 1 is proportional.
    *
    * Engine-exact arithmetic (the oracle replays every step):
    *  - weights floored to e3 fixed-point BIGINTs BEFORE summing
    *    (order-independent integer total — a double Σ would differ in
    *    the last ulp between engines and flip a floor);
    *  - targets by integer floor division `(totalN * s_i) div S`,
    *    capped at n_i — computed in BigInt on the (tiny, driver-side)
    *    strata table, so no alpha/totalN combination can wrap 64-bit
    *    (for alpha = 1 or pow weights s_i = n_i·10³ is unbounded);
    *  - row selection = the deterministic portable-mix rank within the
    *    stratum (same selection machinery as [[sampleByExact]]).
    * Default alpha 0.5 uses `sqrt` (IEEE-correctly-rounded in any
    * engine); arbitrary alpha uses `pow`, whose last ulp is libm-
    * dependent — fine in production, not under a cross-engine oracle.
    *
    * One aggregation + one broadcastable strata-table join + one
    * window over the strata partitioning: the corpus shuffles once.
    */
  def temperatureMix(df: DataFrame, strataCol: String, idCol: String,
                     totalN: Long, alpha: Double = 0.5,
                     portable: Boolean = true): DataFrame = {
    require(totalN >= 0 && alpha >= 0.0)
    val weight =
      if (alpha == 0.5) sqrt(col("__n").cast("double"))
      else if (alpha == 1.0) col("__n").cast("double")
      else if (alpha == 0.0) lit(1.0)
      else pow(col("__n").cast("double"), lit(alpha))
    // ONE corpus aggregation: the strata table is model-sized, so it is
    // collected once and both the weight total and the per-stratum
    // targets derive from the collected rows (the q79 statistic
    // doctrine) — a lazy targets frame over the same lineage would
    // re-run the full-corpus groupBy when the result executes
    val strata = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__s", floor(weight * 1000.0).cast("long"))
      .select(col(strataCol), col("__n"), col("__s"))
      .collect()
    // BigInt product: for alpha = 1 (or pow weights) s_i = n_i·10³ is
    // unbounded, so totalN * s_i can wrap a Long negative and silently
    // empty the stratum via min(n_i, negative). The strata table is
    // driver-side and tiny; the quotient itself always fits (s_i ≤ Σs).
    val totalS = strata.map(r => BigInt(r.getLong(2))).sum.max(BigInt(1))
    val targetRows = strata.map { r =>
      org.apache.spark.sql.Row(r.get(0),
        (BigInt(r.getLong(1)) min (BigInt(totalN) * r.getLong(2) / totalS)).toLong)
    }
    val spark = df.sparkSession
    val targets = spark.createDataFrame(
      java.util.Arrays.asList(targetRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        df.schema(strataCol).copy(name = "__stratum"),
        org.apache.spark.sql.types.StructField("__target",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val mix = if (portable) portableBucket(col(idCol), 1000000007)
      else pmod(xxhash64(col(idCol)), lit(Long.MaxValue))
    val w = Window.partitionBy(col(strataCol)).orderBy(mix, col(idCol))
    // null-safe join: a NULL stratum (missing language id — common in
    // web crawls) is a first-class stratum like in the sibling
    // samplers, not a silently-dropped row set
    df.join(broadcast(targets), df(strataCol) <=> targets("__stratum"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__target"))
      .drop("__rn", "__target", "__stratum")
  }

  /** Weighted sampling WITHOUT replacement, k rows with inclusion
    * tendency ∝ `weightCol` — Efraimidis & Spirakis '06 (A-ES): each
    * row gets key u^(1/w) with u uniform, and the k largest keys are a
    * weighted sample without replacement. The classic use here:
    * token-length-weighted document selection, where sampling rows
    * uniformly would under-represent long documents' token mass.
    *
    * Deterministic and engine-portable, like every sampler in this
    * module: u derives from [[portableMix62]] (exact 64-bit arithmetic,
    * never a random number; the ~2^62 period keeps u effectively
    * collision-free at any corpus size — the low-period mix would give
    * same-residue ids identical u and bias ties toward low ids), and
    * rank order uses
    * ⌊10⁹·ln(u)/w⌋ — monotone in u^(1/w) — with an id tie-break, so
    * the selected SET replays exactly (the ln floor is the q107/q123
    * libm precedent). Top-k plans as `TakeOrderedAndProject`:
    * per-partition heaps of k, no global sort, no shuffle of the
    * corpus.
    *
    * Rows with NULL or non-positive weight are excluded (their
    * inclusion probability is 0 by definition).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(!df.columns.contains("aes_key_e9"),
      "input already carries aes_key_e9 — rename it first")
    // denominator 2^62 (exact in double) sits just above the mix's
    // max value, keeping u in (0, 1); the +1.0 is absorbed by double
    // rounding above 2^53 identically in every IEEE-754 engine
    val u = (portableMix62(col(idCol)).cast("double") + lit(1.0)) / lit(4.611686018427387904e18)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("aes_key_e9",
        floor(lit(1000000000.0) * (log(u) / col(weightCol).cast("double")))
          .cast("long"))
      .orderBy(col("aes_key_e9").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic weighted interleave — the curriculum/layout step
    * that turns a mixed corpus into ONE global training order where
    * each source appears at its configured rate throughout (no
    * "all-of-wiki-then-all-of-web" pockets, which bias early training).
    * Each source's r-th document (1-based rank in `orderCol`,`idCol`
    * order) is scheduled at virtual time ⌊10⁹·r / w⌋ for weight w
    * (e6 fixed-point), so a weight-3 source fires 3× as often as a
    * weight-1 source; sorting by (interleave_key, source, rank) is a
    * total order and IS the training order.
    *
    * The op emits the SORT KEY, not a global row number: a global
    * row_number is a one-partition window (the anti-pattern), while a
    * key + range-partitioned sorted write ([[Layout.writeClustered]])
    * produces the same order with a sampling-based range exchange —
    * the q71 Z-order doctrine. One shuffle (rank window per source);
    * weights ride the plan as a literal when-chain like
    * [[sampleByExact]]'s fractions.
    *
    * Integer bound: keys are ⌊10⁹·r/w⌋ ≤ 10⁹·r, so ranks to ~9·10⁹
    * per source fit a long even at weight 1; beyond that (per-SOURCE
    * rank, not corpus size) move the division to DECIMAL(38,0).
    */
  def interleaveBySource(df: DataFrame, idCol: String, strataCol: String,
                         orderCol: String, weightsE6: Map[String, Long],
                         defaultWeightE6: Long = 1000000L): DataFrame = {
    require(defaultWeightE6 > 0 && weightsE6.values.forall(_ > 0),
      "interleave weights must be positive")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(orderCol), col(idCol))
    val weight = weightsE6.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultWeightE6)) { case (els, (k, v)) =>
        when(col(strataCol) === lit(k), lit(v)).otherwise(els)
      }
    df.withColumn("__w_e6", weight)
      .withColumn("within_rank", row_number().over(w).cast("long"))
      // integer floor division (`div`), never float-div+floor: the
      // oracle's `//` and a double quotient disagree in the last ulp
      .withColumn("interleave_key",
        expr("(within_rank * 1000000000L) div __w_e6"))
      .drop("__w_e6")
  }
}
