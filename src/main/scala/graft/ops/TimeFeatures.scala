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
}
