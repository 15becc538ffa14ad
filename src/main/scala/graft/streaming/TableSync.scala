package graft.streaming

import org.apache.spark.sql.SparkSession

/** THE single-writer catalog-table visibility barrier — one definition
  * for every sink in this package (r17 review: six hand-copied
  * refresh-and-retry blocks had already drifted in logging and
  * identifier quoting, the exact failure the r10 `lwwOverwrite`
  * consolidation fixed once before).
  *
  * Why it exists (measured, StreamingDedup r12): an `insertInto`
  * issued from foreachBatch's cloned session lands on disk but the
  * outer session can keep serving a STALE relation snapshot (~1% of
  * batches) or a zombie cached plan (~2%) — and a sink that reads its
  * own table next batch would then fold against old state. For
  * append-only tables that under-counts; for the read-modify-OVERWRITE
  * loops (DimStore, SCD2 history) it permanently DELETES the missed
  * rows. The barrier: the writer knows the exact row count it just
  * made true, re-reads until the catalog serves it (refresh + bounded
  * retries), and fails LOUD if freshness can't be established — never
  * silently proceeding against an old snapshot.
  */
private[streaming] object TableSync {

  /** Block until each `(db, table)` reads back exactly its expected
    * row count, refreshing the catalog entry between attempts.
    */
  def awaitVisible(spark: SparkSession, expected: Seq[((String, String), Long)],
                   maxAttempts: Int = 5): Unit = {
    def counts() =
      expected.map { case ((db, t), want) =>
        (s"`$db`.`$t`", spark.table(s"`$db`.`$t`").count(), want)
      }
    var attempts = 0
    var c = counts()
    while (c.exists(x => x._2 != x._3) && attempts < maxAttempts) {
      c.filter(x => x._2 != x._3).foreach { case (name, got, want) =>
        System.err.println(
          s"[TableSync] stale snapshot of $name after write ($got/$want) — refreshing")
      }
      expected.foreach { case ((db, t), _) =>
        spark.catalog.refreshTable(s"`$db`.`$t`")
      }
      attempts += 1
      // linear backoff between refreshes (ADVICE r17): a zero-delay
      // retry loop burns all attempts inside the same staleness
      // window; 50ms × attempt gives the filesystem listing ~750ms
      // total to converge before the loud failure
      Thread.sleep(50L * attempts)
      c = counts()
    }
    val bad = c.filter(x => x._2 != x._3)
    if (bad.nonEmpty) {
      // distinguish the two failure modes in the message (ADVICE r17):
      // got < want is a genuinely stale snapshot; got > want means an
      // out-of-band writer appended rows this writer never counted —
      // a single-writer-contract violation no amount of refreshing
      // fixes. Both fail loud: proceeding against either state would
      // let the next read-modify-OVERWRITE loop silently delete rows.
      val msg = bad.map { case (n, got, want) =>
        val kind = if (got > want) "out-of-band writer? (got > expected)"
                   else "stale snapshot"
        s"$n $got/$want [$kind]"
      }.mkString(", ")
      throw new IllegalStateException(
        "table(s) failed to become visible after " + attempts +
          " refreshes: " + msg)
    }
  }

  /** Zombie-entry hygiene (the StreamingDedup r12 lesson): drop any
    * cached plan referencing the table so the next batch resolves it
    * from disk, not a stale canonical match.
    */
  def uncache(spark: SparkSession, db: String, table: String): Unit = {
    org.apache.spark.sql.graft.CatalogCache
      .uncacheReferencing(spark, s"`$db`.`$table`")
    ()
  }
}
