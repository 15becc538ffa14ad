package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.ClassicConversions._

/** Cache hygiene for catalog tables that are APPENDED while derived
  * frames sit in the CacheManager — the streaming incremental-dedup
  * loop's shape (read table → persist derived frames → append to the
  * same table, every micro-batch).
  *
  * Why this exists (the r12 full-suite flake, reproduced ~2% per
  * iteration by `graft.tools.IngestStress`): `insertInto` ends with a
  * `recacheByPlan` walk that re-executes and RE-REGISTERS every cached
  * entry whose plan references the written table. Those re-added
  * entries are not the DataFrame objects our CacheScope tracker holds,
  * so the per-batch release sweep can leave one registered with its
  * storage dropped. `HadoopFsRelation` canonicalization compares root
  * paths, NOT file listings — so the NEXT batch's freshly resolved
  * scan of the table `sameResult`-matches the stale entry, Spark
  * substitutes the zombie `InMemoryRelation`, and the recompute runs
  * through the OLD captured file listing: the batch silently reads the
  * table as it was one batch ago. (Observed as the ingest pipeline
  * missing a cross-batch near-dup pair; post-hoc reads are fresh again
  * because the next append's own recache replaces the entry.)
  *
  * The fix is to drop every cache entry that REFERENCES the table once
  * the batch is done. `CacheManager.uncacheQuery(cascade = true)` is
  * exactly that operation (canonical-plan containment match), but it is
  * `private[sql]` — hence this shim in the sql package, the same
  * precedent as the native expressions next to it.
  */
object CatalogCache {

  /** Remove every CacheManager entry whose plan references `table`
    * (fully qualified or `db`.`tbl`). Driver-only, non-blocking block
    * release; safe to call with no matching entries.
    */
  def uncacheReferencing(spark: SparkSession, table: String): Unit = {
    val plan = spark.table(table).queryExecution.analyzed
    spark.sharedState.cacheManager
      .uncacheQuery(spark, plan, cascade = true, blocking = false)
  }

  /** Re-bind a DataFrame's PHYSICAL rows to another session sharing
    * the same SparkContext, without a Row round-trip: the InternalRow
    * RDD of `df`'s executed plan becomes a leaf frame of `to`. Used by
    * sinks that must run a write under session-ISOLATED SQL conf (e.g.
    * dynamic partitionOverwriteMode on a `newSession()` clone, so the
    * flip can never leak into concurrent writers on the caller's
    * session — r19 ADVICE). Callers pass an already-checkpointed/
    * stable frame: the RDD is re-evaluated by the write exactly once.
    * `internalCreateDataFrame` is `private[sql]` — same shim precedent
    * as [[uncacheReferencing]].
    */
  def rebind(df: org.apache.spark.sql.DataFrame,
             to: SparkSession): org.apache.spark.sql.DataFrame =
    to.internalCreateDataFrame(df.queryExecution.toRdd, df.schema)

  /** The persisted RDDs backing an already-materialized
    * `localCheckpoint(true)` Dataset, read from the checkpointed
    * plan's `LogicalRDD` leaves — NOT by diffing the context's
    * persistent-RDD table around the call (r20: the diff races with
    * CONCURRENT sinks on the same context — a sibling sink's
    * truncated-lineage blocks created inside the window get swept up
    * and unpersisted, killing that sink's batch). Plan-leaf capture
    * attributes the blocks to exactly this frame.
    */
  def checkpointRdds(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
}
