package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing time-RANGE features: for every event, aggregates over the
  * same key's events in the preceding `windowSeconds` (inclusive of the
  * current instant) — "events in the last hour", "spend in the last 24 h";
  * the standard feature-engineering shape for fraud/abuse/engagement
  * models.
  *
  * A RANGE frame (value-based, on epoch seconds), not ROWS: all rows at
  * the same timestamp fall in or out of the frame TOGETHER, so the
  * result is deterministic without a tie column. The numeric sum runs
  * on ⌊10⁶·value⌋ longs — double accumulation order inside a sliding
  * frame is engine-internal, integer sums are order-independent (the
  * q91 doctrine applied to window frames).
  *
  * One shuffle (hash by key) + one sort; every added feature shares the
  * frame. Skew bound = per-key event counts, as with [[Sessionize]].
  */
object TimeFeatures {

  def trailingStats(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, windowSeconds: Long): DataFrame = {
    // INTEGER MICROSECONDS (unix_micros), not unix_timestamp: the
    // fixture's timestamps all carry sub-second parts, and a
    // second-truncated frame bound disagrees with a microsecond-exact
    // oracle both at same-truncated-second collisions and at window
    // boundaries (r11 review: one confirmed trail_n mismatch at sf0.1)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSeconds * 1000000L, 0)
    df.withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_sum_e6",
        sum(floor(col(valueCol) * 1000000.0).cast("long")).over(w))
  }

  /** Resample an event series onto a fixed time grid with
    * last-observation-carried-forward fill — the step that turns
    * irregular events into the regular series every downstream
    * forecasting/feature job assumes. Per key: bucket timestamps to
    * `stepSeconds`-wide cells (floor of epoch micros), aggregate each
    * observed cell (bucket max — picking an input value, so both
    * engines agree bit-for-bit on doubles), then emit EVERY cell
    * between the key's first and last observation, forward-filling the
    * gaps. `observed` distinguishes real cells from filled ones;
    * `v_e6` is the ⌊10⁶·value⌋ integer form of the carried value.
    *
    * Scale shape: the per-cell aggregate partial-aggregates map-side and
    * shuffles only (key, bucket, max, count); the grid explode and the
    * left join both live on the same (key, bucket) keys, and the LOCF
    * window shuffles by key alone. Nothing row-sized ever re-shuffles.
    * The hazard is the GRID, not the data: a key alive for years at a
    * 1-second step would fabricate tens of millions of rows — so the
    * span is guarded by `maxBuckets` and the build fails loudly
    * (assert inside the sequence bound, no extra action) instead of
    * silently exploding an executor.
    */
  def resampleLocf(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, stepSeconds: Long,
                   maxBuckets: Long = 100000L): DataFrame = {
    val stepUs = stepSeconds * 1000000L
    // EXACT floor division, never float-div+floor: a double quotient
    // one ulp above an integer boundary would bucket a row differently
    // from the oracle's integer `//`. (a − pmod(a, s)) is an exact
    // multiple of s, so the final divide is exact in IEEE; pmod's
    // nonnegative remainder makes this a true FLOOR (not truncation)
    // for pre-1970 timestamps too, matching DuckDB's `//`.
    val us = unix_micros(col(tsCol))
    val bucketExpr = ((us - pmod(us, lit(stepUs))) / lit(stepUs)).cast("long")
    val cells = df
      .groupBy(col(keyCol), bucketExpr.as("bucket"))
      .agg(max(col(valueCol)).as("__vmax"), count(lit(1)).as("n_obs"))
    // per-key grid bounds; the assert_true rides the upper bound so
    // Catalyst cannot prune it (a dropped guard column would be
    // optimized away before it ever ran)
    val grid = cells.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col(keyCol), explode(sequence(col("__b0"),
        coalesce(assert_true(col("__b1") - col("__b0") < lit(maxBuckets),
          concat(lit(s"resampleLocf: key "), col(keyCol).cast("string"),
            lit(s" spans more than $maxBuckets buckets"))).cast("long"),
          col("__b1")))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(cells, Seq(keyCol, "bucket"), "left")
      .withColumn("v_e6",
        floor(last(col("__vmax"), ignoreNulls = true).over(w) * 1000000.0)
          .cast("long"))
      .withColumn("observed", col("n_obs").isNotNull)
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .select(col(keyCol), col("bucket"), col("v_e6"), col("n_obs"),
        col("observed"))
  }
}
