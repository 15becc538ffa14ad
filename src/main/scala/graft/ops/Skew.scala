package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.CacheScope.TrackedPersist

/** Hot-key mitigation for aggregations: two-phase salted groupBy.
  *
  * At 100 TB a single hot key (the reference's `keyBy(mid)` pattern
  * with a bot device, or a null-heavy dimension) lands on one reducer
  * and the stage runs at the speed of that task. Salting spreads the
  * hot key over `salts` partial groups, then merges the partials —
  * decomposable aggregates only (sum/count/min/max; avg = sum/count at
  * the caller). AQE's skew-join handles JOIN skew; this is the
  * aggregation-side counterpart.
  */
object Skew {

  /** Salted sum/count aggregation: for each key in `keys`, computes
    * `sum(c) as sum_c` and `count(*) as row_ct` over the salted
    * partials. The salt is the row's position id (r10 review: a hash of
    * the VALUE column collapsed to one salt whenever a hot key carried
    * constant or null values — the doc's own motivating bot-device
    * case — making the mitigation a no-op exactly when it mattered);
    * position spreads unconditionally, and the RESULT is salt-invariant
    * because partials sum over DECIMAL(38,2)-cast values (exact,
    * order-independent — double partial sums would differ in the last
    * bits depending on the salt grouping; precision 38 so magnitudes up
    * to ~10³⁶ cannot overflow-to-NULL) and surface as DOUBLE.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame = {
    require(salts > 0)
    val keyCols: Seq[Column] = keys.map(col)
    val partial = df
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(col(valueCol).cast("decimal(38,2)")).as("_psum"),
        count(lit(1)).as("_pct"))
    partial
      .groupBy(keyCols: _*)
      .agg(sum(col("_psum")).cast("double").as(s"sum_$valueCol"),
        sum(col("_pct")).as("row_ct"))
  }

  /** Zipf-safe enrichment join — the JOIN-side counterpart of
    * [[saltedSumCount]] for the case AQE's skew-join cannot fix at
    * plan time: a probe stream joined to per-key statistics on a
    * power-law key (token → corpus frequency, term → document
    * frequency). The hottest keys are precisely the ones every
    * partition probes, so a plain shuffle join hotspots on the head
    * no matter how the tail is split.
    *
    * Head/tail split instead, exact by construction (head ∪ tail
    * partitions `right`, both legs are the same inner join):
    *  - HEAD: the `topK` hottest right-side keys (caller-supplied
    *    hotness column, deterministic tiebreak on the key) join by
    *    BROADCAST — the head is bounded (topK rows) regardless of
    *    corpus size, and broadcast joins cannot skew.
    *  - TAIL: every remaining key joins by shuffle; each tail key's
    *    frequency is ≤ the K-th hotness by construction, so the
    *    worst shuffle partition is bounded.
    *
    * The head frame is persisted (it feeds both the broadcast and the
    * anti-join defining the tail); session cache hygiene owns its
    * lifecycle, same as the dedup family's intermediates.
    */
  def headTailJoin(left: DataFrame, right: DataFrame, key: String,
                   hotness: Column, topK: Int = 1024,
                   uniqueKeys: Boolean = false): DataFrame = {
    // the head is the topK hottest KEYS, not the topK hottest ROWS
    // (r10 review: with duplicate right-side keys, limit() could cut
    // INSIDE a key and the anti-join then dropped that key's leftover
    // rows from both legs — rows lost vs the plain join). Per-key max
    // hotness is a key-count-sized aggregate plus a semi join; when the
    // caller KNOWS right is keyed uniquely (e.g. it is itself a groupBy
    // output, as both in-repo call sites are), `uniqueKeys = true`
    // selects rows directly — same result, one TakeOrdered instead of
    // agg + TakeOrdered + semi join (measured ~1.5 s off q81 at sf0.1).
    val head =
      if (uniqueKeys)
        right.orderBy(hotness.desc, col(key)).limit(topK).persistTracked()
      else {
        val headKeys = right.groupBy(col(key)).agg(max(hotness).as("__h"))
          .orderBy(col("__h").desc, col(key)).limit(topK).select(col(key))
        right.join(headKeys, Seq(key), "left_semi").persistTracked()
      }
    val tail = right.join(head.select(col(key)), Seq(key), "left_anti")
    left.join(broadcast(head), Seq(key))
      .unionByName(left.join(tail, Seq(key)))
  }
}
