package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus snapshot diff — versioning for training datasets.
  *
  * Rebuilding a 100 TB corpus from scratch per release is the naive
  * path; the production shape is diffing snapshot N against N+1 and
  * reprocessing only the delta (re-tokenize/re-embed changed docs,
  * retire removed ones, run added ones through the ingest gate). The
  * diff itself must not compare text: both sides reduce to
  * (id, 8-byte content fingerprint), the full-outer join shuffles
  * 16 bytes per row, and text is only ever read again downstream for
  * the delta rows.
  */
object Snapshot {

  /** One row per id whose membership or content changed between the
    * snapshots: `change` ∈ added | removed | changed. Unchanged rows
    * (same id, same normalized-content fingerprint) are dropped — at
    * scale that is almost everything, so the output is delta-sized.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           idCol: String, textCol: String): DataFrame = {
    def fp(df: DataFrame, side: String) = df.select(
      col(idCol),
      TextFunctions.contentFingerprint(col(textCol)).as(s"__fp_$side"))
    fp(oldSnap, "old").join(fp(newSnap, "new"), Seq(idCol), "full_outer")
      .withColumn("change",
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "removed")
          .when(col("__fp_old") =!= col("__fp_new"), "changed")
          .otherwise("unchanged"))
      .filter(col("change") =!= "unchanged")
      .select(col(idCol), col("change"))
  }
}
