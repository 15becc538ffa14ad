package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build and point-in-time
  * reads — the warehouse layer under every "what did this dimension
  * look like when the fact happened" join. The reference materializes
  * dim tables as last-write-wins upserts (its HBase/Redis dim path,
  * SRC/utils/PhoenixUtil.scala usage); SCD2 is the batch-side
  * generalization that keeps the full version history queryable, and
  * pairs with [[AsOfJoin]] (which answers the same question against an
  * event stream instead of a versioned dim).
  *
  * Scale shape: one hash shuffle by `keyCol` and one sort carry both
  * windows (run-collapse lag + effective_to lead) — Catalyst reuses the
  * sort across the intervening filter, so the whole build is a single
  * exchange. Version-history skew is bounded by per-key change counts,
  * which for real dimensions are small; the changelog's attribute
  * payload rides the one shuffle untouched.
  */
object Scd {

  /** Collapse a changelog (one row per observed version) into SCD2
    * history rows `[effective_from, effective_to)`.
    *
    * - Ordering within a key is `(tsCol, tieCol)` — the tie column makes
    *   same-timestamp updates deterministic (q122 doctrine).
    * - Consecutive versions whose `attrCols` are unchanged (null-safe
    *   struct compare) are collapsed into the run's first row, so the
    *   output is run-length bounded, not changelog-sized.
    * - `effective_to` is the NEXT kept version's `effective_from`
    *   (half-open intervals; no gaps, no overlaps); null marks the
    *   current version, also exposed as `is_current`.
    */
  def buildHistory(changelog: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, attrCols: Seq[String]): DataFrame = {
    val ord = Seq(col(tsCol), col(tieCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val attrs = struct(attrCols.map(col): _*)
    changelog
      .withColumn("__prev_attrs", lag(attrs, 1).over(w))
      // null-safe: the first version (lag null) always starts a run
      .filter(!(col("__prev_attrs") <=> attrs))
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .select((col(keyCol) +: attrCols.map(col)) ++
        Seq(col("effective_from"), col("effective_to"), col("is_current")): _*)
  }

  /** Point-in-time read over an SCD2 history: the one version of each
    * key whose `[effective_from, effective_to)` interval contains
    * `asOf`. A plain filter — no window, no shuffle — so it pushes down
    * to the scan; on a history partitioned by effective_from date it
    * also prunes partitions.
    */
  def snapshotAt(history: DataFrame, asOf: Column): DataFrame =
    history.filter(col("effective_from") <= asOf &&
      (col("effective_to").isNull || col("effective_to") > asOf))

  /** INCREMENTAL SCD2: apply a new changelog batch to an existing
    * history — the nightly production shape, where rebuilding a
    * billion-row history from the full changelog for a day's updates
    * is the naive path. Result ≡ [[buildHistory]] over (original ∪ new)
    * changelog — the q143 oracle gates exactly that equality — under
    * the APPEND-ONLY contract: every new row's ts is later than its
    * key's current `effective_from`. Violating rows (retro-edits) are
    * DROPPED; retro-edits need the rebuild path, silently splicing them
    * would corrupt closed intervals.
    *
    * Shape: only AFFECTED keys (those present in the batch) do any
    * work. Their CURRENT rows re-enter the fold as seeds — carrying
    * their ORIGINAL `effective_from` and a minimal tie value, so an
    * unchanged-attribute first new version collapses into the open row
    * exactly as the full rebuild would — and the fold is
    * [[buildHistory]] over (seeds ∪ batch): batch-sized + one-row-per-
    * affected-key, never history-sized. Untouched keys and affected
    * keys' CLOSED rows pass through without a shuffle beyond the
    * semi/anti joins on the key (AQE broadcasts the affected-key list
    * when the batch is small — the common case).
    */
  def applyChangelog(history: DataFrame, changelog: DataFrame,
                     keyCol: String, tsCol: String, tieCol: String,
                     attrCols: Seq[String]): DataFrame =
    applyChangelogWithRejects(history, changelog, keyCol, tsCol, tieCol,
      attrCols)._1

  /** [[applyChangelog]] plus the REJECTED rows as a side output — the
    * observability half of the append-only contract: dropped rows
    * (retro-edits) otherwise leave no trace, so incremental-vs-rebuild
    * drift in production is undetectable until an audit rebuild. Write
    * the second frame to a quarantine table or count it; non-empty
    * means this batch needs the rebuild path.
    *
    * Why the guard stays STRICT (`ts > effective_from`, ties rejected)
    * rather than tuple-comparing `(ts, tie)`: the history no longer
    * carries the tie column, and — deeper — the open run may have
    * COLLAPSED same-attribute versions whose (ts, tie) positions are
    * gone from the history entirely. A same-ts batch row can interleave
    * between those vanished members in the full rebuild (splitting the
    * run into versions the incremental fold cannot reconstruct), so
    * accepting ties would silently diverge from the rebuild exactly
    * where the q143 oracle demands equality. Same-ts updates are
    * retro-edits under this contract; give them to the rebuild.
    */
  def applyChangelogWithRejects(history: DataFrame, changelog: DataFrame,
                                keyCol: String, tsCol: String, tieCol: String,
                                attrCols: Seq[String]): (DataFrame, DataFrame) = {
    val affected = changelog.select(col(keyCol)).distinct()
    val affectedCurrent = history
      .join(affected, Seq(keyCol), "left_semi").filter(col("is_current"))
    val tieType = changelog.schema(tieCol).dataType
    val seeds = affectedCurrent.select(
      (col(keyCol) +: col("effective_from").as(tsCol) +:
        lit(Long.MinValue).cast(tieType).as(tieCol) +:
        attrCols.map(col)): _*)
    // append-only guard: a batch row at or before its key's current
    // effective_from would sort before the seed and corrupt the splice
    val withCur = changelog
      .join(affectedCurrent.select(col(keyCol),
        col("effective_from").as("__cur_from")), Seq(keyCol), "left")
    val outCols = (col(keyCol) +: col(tsCol) +: col(tieCol) +:
      attrCols.map(col))
    val guarded = withCur
      .filter(col("__cur_from").isNull || col(tsCol) > col("__cur_from"))
      .select(outCols: _*)
    // the reject filter is the EXACT complement of the guard (not the
    // naive `ts <= __cur_from`): a NULL ts against a non-null
    // __cur_from is three-valued-NULL under BOTH comparisons, which
    // would drop the row from both outputs silently — precisely the
    // invisibility this side output exists to eliminate
    val rejected = withCur
      .filter(col("__cur_from").isNotNull &&
        !coalesce(col(tsCol) > col("__cur_from"), lit(false)))
      .select(outCols: _*)
    val fragment = buildHistory(seeds.unionByName(guarded),
      keyCol, tsCol, tieCol, attrCols)
    val merged = history.join(affected, Seq(keyCol), "left_anti")
      .unionByName(history.join(affected, Seq(keyCol), "left_semi")
        .filter(!col("is_current")))
      .unionByName(fragment)
    (merged, rejected)
  }
}
