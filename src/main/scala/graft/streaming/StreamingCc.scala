package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Streaming label maintenance — the ingest-path face of connected
  * components, completing the incremental dedup regime:
  * [[StreamingDedup.incrementalDedupSink]] turns each micro-batch of
  * documents into a near-dup PAIR delta against everything seen so
  * far; this sink folds that delta into a standing LABEL table via
  * [[graft.ops.Dedup.connectedComponentsIncremental]]; and
  * [[graft.ops.Dedup.keepBestByLabelFrame]] applies the production
  * keep-policy to the maintained table. Together they replace the
  * nightly full CC rebuild with a per-batch delta merge.
  *
  * Contract (the ScdIngest/ReleaseGate batch-equivalence doctrine,
  * spec-gated by `StreamingCcSpec`):
  *  - after any number of micro-batches, the standing table equals ONE
  *    `connectedComponents` run over every pair ever delivered —
  *    micro-batch boundaries are invisible. The induction is
  *    structural: the incremental operator's output labels are always
  *    component MINIMA (its precondition for the next call), and each
  *    fold step is an exact merge of standing ∪ delta;
  *  - REPLAY-SAFE by construction: re-merging an already-applied pair
  *    batch contracts every edge to a self-loop (both endpoints carry
  *    the merged label already), the delta CC runs over an empty
  *    graph, and the remap is the identity — Structured Streaming's
  *    re-run of the last batchId after a failure leaves the table
  *    byte-identical. No quarantine or batchId ledger needed;
  *  - the at-least-once pair stream's duplicate (id_a, id_b) rows are
  *    absorbed the same way (an edge inside one component is a
  *    self-loop after contraction).
  *
  * Scale shape — the reason this exists: the per-batch CC iteration
  * runs over the CONTRACTED DELTA graph (≤ |batch pairs| edges), never
  * the standing edge set; the standing label table is touched by ONE
  * remap join against the delta-sized merged labels (AQE broadcasts it
  * — the daily case). A 10¹¹-standing-edge graph absorbs a 10⁶-pair
  * batch at delta cost. The table REWRITE is labels-table-sized (only
  * clustered documents appear — at corpus scale a small minority); at
  * 100 TB the same fold wants an ACID table format's MERGE keyed on
  * the changed labels (the remap join already computes exactly the
  * delta of changed rows), with identical semantics.
  */
object StreamingCc {

  def ensureTable(spark: SparkSession, db: String, labelTable: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$db`.`$labelTable` " +
      "(`id` BIGINT, `label` BIGINT) USING PARQUET")
  }

  /** foreachBatch sink over a PAIR stream (columns `id_a`, `id_b` —
    * the [[StreamingDedup]] output shape): maintains `db.labelTable`
    * as the CC labeling of every pair ever delivered. Plug it straight
    * into `incrementalDedupSink(...)(labelSink)` for the composed
    * ingest-path dedup pipeline. `onBatch(batchId, nDeltaPairs,
    * nLabels)` is the observability hook.
    */
  def incrementalCcSink(spark: SparkSession, db: String, labelTable: String,
                        maxIter: Int = 20)
                       (onBatch: (Long, Long, Long) => Unit = (_, _, _) => ())
      : (DataFrame, Long) => Unit = {
    ensureTable(spark, db, labelTable)
    val target = s"`$db`.`$labelTable`"
    // single-writer visibility barrier (the StreamingDedup doctrine):
    // batch N+1 folds against batch N's labels only if its catalog
    // read SEES the overwrite — track the expected row count and
    // refresh/retry on a stale snapshot, failing loud, never silently
    // folding against an old labeling
    var expectedLabels = spark.table(target).count()
    def awaitVisible(): Unit = TableSync.awaitVisible(spark,
      Seq(((db, labelTable), expectedLabels)))
    (pairs: DataFrame, batchId: Long) => {
      // no-data / no-pair micro-batches exit on one cheap isEmpty job —
      // the standing table is already the correct labeling
      if (pairs.isEmpty) onBatch(batchId, 0L, expectedLabels)
      else {
        val delta = pairs.select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b")).persist()
        val preexisting = spark.sparkContext.getPersistentRDDs.keySet
        val scopeMark = graft.ops.CacheScope.mark(spark)
        try {
          val nPairs = delta.count()
          val oldLabels = spark.table(target)
          // truncate lineage: the overwrite below must not read the
          // files it replaces (the DimStore.lwwOverwrite doctrine)
          val next = Dedup
            .connectedComponentsIncremental(oldLabels, delta, maxIter)
            .localCheckpoint(true)
          val nLabels = next.count()
          next.write.mode("overwrite").insertInto(target)
          expectedLabels = nLabels
          awaitVisible()
          onBatch(batchId, nPairs, nLabels)
        } finally {
          spark.sparkContext.getPersistentRDDs
            .filter { case (rddId, _) => !preexisting.contains(rddId) }
            .values.foreach(_.unpersist(blocking = false))
          graft.ops.CacheScope.releaseSince(spark, scopeMark)
          delta.unpersist()
          // zombie-entry hygiene (the StreamingDedup r12 lesson): drop
          // any cached entry referencing the table so the next batch
          // resolves it from disk, not a stale canonical match
          org.apache.spark.sql.graft.CatalogCache
            .uncacheReferencing(spark, target)
          ()
        }
      }
    }
  }

  /** The maintained labeling, as the (id, label) frame every derived
    * view consumes ([[graft.ops.Dedup.keepBestByLabelFrame]], drop
    * lists, histograms).
    */
  def labels(spark: SparkSession, db: String, labelTable: String): DataFrame =
    spark.table(s"`$db`.`$labelTable`")

  /** Keep-best view over the maintained labels — the composed
    * ingest-path deliverable: corpus table + label table → the
    * best-scoring representative per near-dup cluster, no CC rerun.
    */
  def keepBest(spark: SparkSession, db: String, labelTable: String,
               corpus: DataFrame, idCol: String, scoreCol: String): DataFrame =
    Dedup.keepBestByLabelFrame(corpus, idCol, scoreCol,
      labels(spark, db, labelTable))
}
