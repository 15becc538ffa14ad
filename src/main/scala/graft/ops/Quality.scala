package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The composed C4-style document quality gate, shared by the batch
  * query (q69) and the streaming ingest pipeline: keep/drop with a
  * first-failing-reason label, built from the oracle-replayable scalar
  * signals. The whole policy is literals in one codegen'd CASE — a
  * threshold change is a plan change, not a data change.
  */
object Quality {

  def gateReason(text: Column,
                 minChars: Long = 200, maxChars: Long = 20000,
                 mtlMinE4: Long = 20000, mtlMaxE4: Long = 120000,
                 minStopE4: Long = 100): Column = {
    val charCt = length(text).cast("long")
    val mtl = TextFunctions.meanTokenLen(text)
    val stop = TextFunctions.qualityStopwordRatio(text)
    // null FIRST: every later predicate evaluates NULL on null text and
    // a when-chain skips NULL conditions — without this branch a null
    // document falls through to "keep" (found in the r10 review; the
    // streaming ingest gate must reject them, and a parse-failed row is
    // exactly the doc you least want in a corpus)
    when(text.isNull, "null_text")
      .when(charCt < minChars, "too_short")
      .when(charCt > maxChars, "too_long")
      .when(mtl < mtlMinE4 || mtl > mtlMaxE4, "token_len_out_of_range")
      .when(stop < minStopE4, "low_stopword_density")
      .otherwise("keep")
  }
}
