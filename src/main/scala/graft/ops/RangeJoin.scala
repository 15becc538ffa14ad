package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — points against (possibly overlapping) intervals.
  *
  * Spark has no native range-join strategy: a bare
  * `points.join(intervals, p >= lo && p <= hi)` plans as a
  * BroadcastNestedLoopJoin (or a cartesian), which is |P|×|I| work —
  * a scale cliff the moment the interval side outgrows trivial.
  *
  * The standard fix (same trick as the interval-overlap joins in
  * big-data SQL engines): quantize the range domain into fixed-width
  * buckets, explode each interval into the buckets it covers, and
  * equi-join on the bucket — Catalyst then picks a broadcast or
  * shuffled HASH join like any other equi-join, with the true range
  * predicate left as a cheap residual filter. A point lives in exactly
  * one bucket, so no pair can appear twice and no dedup pass is needed.
  *
  * Cost model: the interval side inflates by ⌈span/width⌉ rows; the
  * point side does not inflate at all. Pick `bucketWidth` near the
  * typical interval span — one output row per interval-bucket overlap,
  * shuffle volume |P| + Σ⌈span_i/width⌉.
  */
object RangeJoin {

  /** Join `points` to every interval row with `lo <= point <= hi`
    * (inclusive both ends; integer domains). Columns from both inputs
    * survive; each (point, interval) match appears exactly once.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("__bkt",
      floor(col(pointCol).cast("double") / bucketWidth).cast("long"))
    val i = intervals.withColumn("__bkt",
      explode(sequence(
        floor(col(loCol).cast("double") / bucketWidth).cast("long"),
        floor(col(hiCol).cast("double") / bucketWidth).cast("long"))))
    p.join(i, "__bkt")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bkt")
  }

  /** Interval × interval overlap join: every (left, right) pair with
    * `l.lo <= r.hi && r.lo <= l.hi`. Both sides explode into covering
    * buckets; an overlapping pair shares EVERY bucket in the overlap
    * region, so the pair is claimed by exactly one owner — the bucket
    * containing `max(l.lo, r.lo)` (the overlap's left edge, which both
    * covers contain by definition) — instead of a post-join dedup
    * shuffle. Column names must be disjoint across the two inputs.
    */
  def intervalOverlap(left: DataFrame, lloCol: String, lhiCol: String,
                      right: DataFrame, rloCol: String, rhiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    def cover(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bkt", explode(sequence(
        floor(col(lo).cast("double") / bucketWidth).cast("long"),
        floor(col(hi).cast("double") / bucketWidth).cast("long"))))
    cover(left, lloCol, lhiCol).join(cover(right, rloCol, rhiCol), "__bkt")
      .filter(col(lloCol) <= col(rhiCol) && col(rloCol) <= col(lhiCol))
      .filter(col("__bkt") ===
        floor(greatest(col(lloCol), col(rloCol)).cast("double") / bucketWidth)
          .cast("long"))
      .drop("__bkt")
  }
}
