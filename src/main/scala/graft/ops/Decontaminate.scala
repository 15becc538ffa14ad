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
  *     probed by a codegen'd [[BloomFilterMightContain]] on
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
  */
object Decontaminate {

  /** Serialized bloom sketch of `xxhash64(keyCol)` over `contam`,
    * wrapped as a might-contain Column probe for `probeKey`. The probe
    * is Catalyst's own codegen'd bloom expression — the same kernel
    * injected by Spark's runtime row-level filtering — so it inlines
    * into whole-stage codegen on the corpus scan.
    */
  private def mightContain(contam: DataFrame, keyCol: Column,
                           probeKey: Column, fpp: Double): Column = {
    val hashed = contam.select(xxhash64(keyCol).as("__ck")).distinct()
    val n = math.max(hashed.count(), 1L)
    val bloom = hashed.stat.bloomFilter("__ck", n, fpp)
    val os = new java.io.ByteArrayOutputStream()
    bloom.writeTo(os)
    BloomProbe.mightContainLong(os.toByteArray, xxhash64(probeKey))
  }

  /** Exact `corpus ANTI JOIN contam` with the corpus-side shuffle
    * reduced to bloom-positive rows only. `corpusKey`/`contamKey` are
    * key expressions over their respective frames.
    */
  def antiJoin(corpus: DataFrame, corpusKey: Column,
               contam: DataFrame, contamKey: Column,
               fpp: Double = 0.01): DataFrame = {
    val mc = mightContain(contam, contamKey, corpusKey, fpp)
    // definite non-members stream straight through — no exchange
    val clean = corpus.filter(!mc)
    // bloom positives (true matches + ~fpp of corpus) get the exact check
    val keys = contam.select(contamKey.as("__k")).distinct()
    val cleared = corpus.filter(mc)
      .join(keys, corpusKey === col("__k"), "left_anti")
    clean.unionByName(cleared)
  }

  /** Same two-phase shape, keep-everything variant: flags each corpus
    * row with `contaminated` instead of dropping it (audit / lineage
    * mode). Bloom negatives are flagged false map-side; only bloom
    * positives pay the exact semi-join.
    */
  def flag(corpus: DataFrame, corpusKey: Column,
           contam: DataFrame, contamKey: Column,
           fpp: Double = 0.01): DataFrame = {
    val mc = mightContain(contam, contamKey, corpusKey, fpp)
    val keys = contam.select(contamKey.as("__k")).distinct()
    val positives = corpus.filter(mc)
    val confirmed = positives
      .join(keys, corpusKey === col("__k"), "left_semi")
      .withColumn("contaminated", lit(true))
    val falsePos = positives
      .join(keys, corpusKey === col("__k"), "left_anti")
      .withColumn("contaminated", lit(false))
    corpus.filter(!mc).withColumn("contaminated", lit(false))
      .unionByName(confirmed).unionByName(falsePos)
  }
}
