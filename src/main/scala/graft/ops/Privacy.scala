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
    // groupBy puts NULL quasi values in their own cohort, so the join
    // back must be null-SAFE (<=>) or the NULL cohort never matches its
    // own count and a sub-k cohort containing a NULL leaks unsuppressed.
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__cell_n"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+ col("__cell_n"): _*)
    val cond = quasiCols
      .map(c => df(c) <=> counts(s"__q_$c"))
      .reduce(_ && _)
    val joined = df.join(counts, cond, "left")
    val out = df.columns.map { c =>
      if (quasiCols.contains(c))
        // fail CLOSED: an unmatched row (no count — cannot happen with a
        // null-safe join, kept as the conservative backstop) suppresses.
        when(col("__cell_n").isNull || col("__cell_n") < k, lit(suppressed))
          .otherwise(df(c).cast("string")).as(c)
      else df(c)
    }
    joined.select(out.toIndexedSeq: _*)
  }

  /** l-DIVERSITY suppression (Machanavajjhala et al., ICDE'06) —
    * k-anonymity's attribute-disclosure sibling: a cohort can be
    * k-anonymous and still leak, when (nearly) everyone in it shares
    * the SENSITIVE value ("all 40-49/10025 patients have cancer").
    * Cohorts whose sensitive column holds fewer than `l` DISTINCT
    * non-null values get their quasi columns replaced by the marker —
    * the same pooling disposition as [[suppressSmallCells]], and the
    * two gates compose (apply both; each is a projection + broadcast
    * join back).
    *
    * NULL handling, both fail-closed: NULL quasi values form their own
    * cohort and join back null-safely (the r16 suppressSmallCells
    * lesson applied from day one); NULL sensitive values do NOT count
    * toward diversity (an all-NULL cohort has 0 distinct → always
    * suppressed).
    *
    * Scale shape: ONE exchange builds the per-cell distinct count
    * (two-level aggregate — distinct (quasi, sensitive) first, both
    * map-side combined, bounded by cells × distinct-sensitive, not the
    * corpus); the suppression join-back broadcasts. Corpus never
    * shuffles.
    */
  def suppressLowDiversity(df: DataFrame, quasiCols: Seq[String],
                           sensitiveCol: String, l: Long,
                           suppressed: String = "*"): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      "the sensitive column cannot be a quasi-identifier")
    require(l >= 1, s"l must be >= 1, got $l")
    val counts = df
      .select(quasiCols.map(col) :+ col(sensitiveCol): _*)
      .filter(col(sensitiveCol).isNotNull)
      .distinct()
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__div_n"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+ col("__div_n"): _*)
    val cond = quasiCols
      .map(c => df(c) <=> counts(s"__q_$c"))
      .reduce(_ && _)
    val joined = df.join(counts, cond, "left")
    val out = df.columns.map { c =>
      if (quasiCols.contains(c))
        // an unmatched row means the cohort had ZERO non-null
        // sensitive values (the filter dropped it entirely) — 0 < l,
        // suppress: the isNull branch here is load-bearing, not a
        // backstop
        when(col("__div_n").isNull || col("__div_n") < l, lit(suppressed))
          .otherwise(df(c).cast("string")).as(c)
      else df(c)
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
    * Same shape as [[suppressSmallCells]], but the exchanges carry a
    * 128-bit FINGERPRINT of the key, never the key text: extracted
    * spans/n-grams (the stated memorization use case) can be KBs, and
    * shipping them through the distinct pass and the semi join would
    * make both exchanges corpus-text-sized. Two independent xxhash64
    * lanes (unsalted + salted) form the fingerprint, so a false
    * release needs a simultaneous collision in both lanes — expected
    * colliding pairs ~ n²/2¹²⁹, negligible at any corpus size (the
    * single-lane 64-bit variant would already be ~0.03 expected pairs
    * at 10⁹ distinct keys, but its failure direction is toward
    * RELEASE, so we pay the second 8 bytes for the two-lane posture).
    */
  def frequencyThreshold(df: DataFrame, keyCol: String, docCol: String,
                         minDocs: Long): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    // NULL keys FAIL CLOSED: xxhash64 skips null inputs (yields the
    // seed constant), so without this filter every NULL key would pool
    // into one pseudo-key and RELEASE once NULL rows span minDocs
    // distinct docs — the failure direction the gate must never take.
    // The pre-fingerprint text semi-join dropped them implicitly
    // (null-unsafe equality); the fingerprint form drops them
    // explicitly, on both the counting side and the release side.
    val nonNull = df.filter(col(keyCol).isNotNull)
    def fp(c: Column): (Column, Column) =
      (xxhash64(c), xxhash64(lit("graft.fq.salt"), c))
    val (h1, h2) = fp(col(keyCol))
    val ok = nonNull.select(h1.as("__kh1"), h2.as("__kh2"),
        col(docCol).as("__doc")).distinct()
      .groupBy(col("__kh1"), col("__kh2"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("__kh1"), col("__kh2"))
    nonNull.join(ok, h1 === ok("__kh1") && h2 === ok("__kh2"), "left_semi")
  }
}
