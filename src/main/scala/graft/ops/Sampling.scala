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

  /** Engine-portable mix: ((id mod 1000003) * 2654435761) mod 1000000007
    * mod nBuckets. Every term stays below 2^63 (max ~2.65e15), so the
    * arithmetic is exact in any 64-bit engine — no overflow even under
    * ANSI mode, no float rounding.
    */
  def portableBucket(id: Column, nBuckets: Int): Column =
    pmod(pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(1000000007L)),
      lit(nBuckets.toLong))

  /** Deterministic named split (train/val/test): cumulative weight
    * ranges over a 1e6-bucket mix of the id. A row's split never
    * changes across runs, repartitions, or cluster sizes; no shuffle,
    * no state. Weights must sum to 1 (±1e-9).
    */
  def assignSplit(df: DataFrame, idCol: String,
                  weights: Seq[(String, Double)],
                  portable: Boolean = false): DataFrame = {
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val n = 1000000
    val b = if (portable) portableBucket(col(idCol), n) else hashBucket(col(idCol), n)
    val cuts = weights.scanLeft(0.0)(_ + _._2).map(c => (c * n).toLong)
    val expr = weights.zipWithIndex.foldRight(lit(weights.last._1)) {
      case (((name, _), i), els) =>
        if (i == weights.size - 1) els
        else when(b < lit(cuts(i + 1)), lit(name)).otherwise(els)
    }
    df.withColumn("split", expr)
  }

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
}
