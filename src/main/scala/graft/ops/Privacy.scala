package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Release-side privacy gates for published corpora/statistics — the
  * counterpart of scrub-side PII redaction (q67): redaction cleans the
  * text, these operators gate what the RELEASE may reveal about small
  * cohorts. Standard practice for public corpus stat tables and
  * memorization mitigation (small-cell suppression / k-anonymity;
  * frequency-threshold release is the same rule keyed on content).
  */
object Privacy {

  /** k-anonymity small-cell suppression: rows whose quasi-identifier
    * combination (the released grouping attributes) is shared by fewer
    * than `k` rows get every quasi column REPLACED by the `suppressed`
    * marker, so any downstream aggregate pools them into one residual
    * cohort — totals stay exact, no cohort smaller than k is ever
    * distinguishable. Non-quasi columns pass through untouched.
    *
    * The residual marker cohort may itself hold fewer than k rows
    * (union of tiny cells); that is the standard disposition — it
    * reveals only "some suppressed row", never which cell.
    *
    * Scale shape: ONE exchange builds the cell-count table (map-side
    * combined — ≤ |cells| rows per partition on the wire); the
    * suppression itself is a join back on the quasi key, which AQE
    * broadcasts whenever the cell table is small (the usual case — it
    * is bounded by the quasi-attribute cross product, not the corpus).
    * The corpus never shuffles.
    */
  def suppressSmallCells(df: DataFrame, quasiCols: Seq[String], k: Long,
                         suppressed: String = "*"): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__cell_n"))
    val joined = df.join(counts, quasiCols, "left")
    val out = df.columns.map { c =>
      if (quasiCols.contains(c))
        when(col("__cell_n") < k, lit(suppressed))
          .otherwise(col(c).cast("string")).as(c)
      else col(c)
    }
    joined.select(out.toIndexedSeq: _*)
  }

  /** Frequency-threshold release gate on CONTENT keys (the
    * memorization-mitigation rule: publish an extracted fact/n-gram/
    * URL only when it occurs in ≥ `minDocs` DISTINCT documents):
    * returns the rows of `df` whose `keyCol` clears the document
    * threshold. Counting is over distinct (key, doc) so within-doc
    * repetition cannot launder a rare key past the gate.
    *
    * Same shape as [[suppressSmallCells]]: the distinct + count
    * aggregate exchanges (key, doc) fingerprint-width rows with
    * map-side combine; the survivors join is a semi join the planner
    * broadcasts when the surviving key set is small.
    */
  def frequencyThreshold(df: DataFrame, keyCol: String, docCol: String,
                         minDocs: Long): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val ok = df.select(col(keyCol), col(docCol)).distinct()
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col(keyCol))
    df.join(ok, Seq(keyCol), "left_semi")
  }
}
