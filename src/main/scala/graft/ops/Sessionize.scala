package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: assign a session ordinal to every event by the
  * classic inactivity-gap rule (a session breaks when the gap to the
  * previous event of the same key exceeds `gapSeconds`).
  *
  * The repo's streaming side has session WINDOW aggregation
  * ([[graft.apps.Pipelines]] / q28); this is the batch labeling form —
  * every event keeps its row and gains (session_seq, is_session_start),
  * which is what funnel/attribution queries join on.
  *
  * Shape: ONE shuffle (hash by key); both windows — the lag and the
  * running sum of break flags — share that partitioning and ordering, so
  * Catalyst plans a single Exchange + one sort. Ordering is
  * (ts, tieCol) — the tie column makes same-timestamp events
  * deterministic (and oracle-replayable). Skew bound: per-key event
  * counts; a key hot enough to skew a window at 100 TB is a bot, and
  * bots are what [[Skew.saltedAgg]] and upstream gates are for.
  */
object Sessionize {

  def assignSessions(df: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, gapSeconds: Long): DataFrame = {
    require(!df.columns.contains("session_seq") &&
      !df.columns.contains("is_session_start") &&
      !df.columns.contains("__graft_sess_start"),
      "input already carries session columns — rename them first")
    // gaps in INTEGER MICROSECONDS (unix_micros), not unix_timestamp:
    // second-truncation makes a 1800.8 s gap read as exactly 1800 and
    // silently disagree with a fractional-epoch oracle (r11 review —
    // the fixture's timestamps all carry sub-second parts)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val gap = unix_micros(col(tsCol)) -
      unix_micros(lag(col(tsCol), 1).over(w))
    // two steps, not a nested window: the break flag materializes first
    // (lag window), then the running sum references the COLUMN — same
    // partitioning and ordering, so both land on one Exchange + sort
    df.withColumn("__graft_sess_start",
        when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__graft_sess_start")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("is_session_start", col("__graft_sess_start") === 1L)
      .drop("__graft_sess_start")
  }
}
