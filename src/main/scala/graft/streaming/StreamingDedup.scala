package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Streaming near-duplicate detection: the minhash corpus index
  * ([[graft.ops.Dedup.buildMinhashIndex]]) maintained as a catalog
  * table and consulted by every micro-batch — the streaming face of the
  * incremental dedup operator, structurally the same loop as the
  * reference's CDC dim pipeline (state in a store, each batch reads
  * current state, emits, writes state back; rt-flink
  * OdsBaseDbApp.scala:92-119 with Phoenix swapped for a signature
  * table).
  *
  * Per batch: near-dup pairs of the batch against EVERYTHING seen so
  * far (plus within-batch pairs) go to `onPairs`; then the batch's
  * signatures append to the index and its rows to the corpus table, so
  * batch N+1 dedups against batches 1..N by construction.
  *
  * Scale: the per-batch cost is the incremental operator's — only the
  * batch is shingled, the band join shuffles index-sized rows, and
  * historical text is re-read only for prefilter survivors. The index
  * grows k+1 longs per document ever seen; the corpus-table append is
  * the raw batch. At-least-once caveat: a replayed batch re-appends its
  * ids — downstream consumers of the pair stream dedup on (id_a, id_b)
  * (idempotent by key, the same contract as the reference's ClickHouse
  * sink), and the index tolerates duplicate rows (identical signatures
  * band into identical buckets; `distinct` in the candidate stage
  * collapses them).
  */
object StreamingDedup {

  def ensureTables(spark: SparkSession, db: String, corpusTable: String,
                   indexTable: String, k: Int): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS `$db`.`$corpusTable` (`id` BIGINT, `text` STRING) USING PARQUET")
    val sigCols = (0 until k).map(i => s"`m$i` BIGINT").mkString(", ")
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS `$db`.`$indexTable` (`id` BIGINT, $sigCols) USING PARQUET")
  }

  /** foreachBatch sink. `onPairs` is the batch's output action and MUST
    * materialize its DataFrame (write/collect) before returning — the
    * sink releases the batch's cached intermediates right after it.
    *
    * Per-trigger cost discipline (r10 — measured at 500-doc triggers,
    * where the job COUNT, not the data, was the cost):
    *  - table DDL runs ONCE here at sink creation, not per batch;
    *  - the batch's signatures are computed ONCE and appended to the
    *    index as-is ([[Dedup.minhashLshIncrementalWithIndex]]) instead
    *    of a second shingle+sign pass;
    *  - the dedup runs the `smallBatch` profile (batch buckets
    *    broadcast, no estimate prefilter — exact verify decides, so
    *    output semantics are unchanged);
    *  - the two table appends are independent of each other and of the
    *    already-materialized pair output — they run CONCURRENTLY (each
    *    is one coalesced task + a commit; the wall cost is the max,
    *    not the sum). Appends stay AFTER onPairs so the pair plan's
    *    table snapshots cannot race the batch's own appends;
    *  - output files per batch per table scale with the BATCH, not a
    *    constant: `⌈rows/rowsPerFile⌉` coalesced tasks, floor 1
    *    (Compaction's sizing arithmetic). At trigger cadence small
    *    batches still write one file each — file count, not file size,
    *    is what degrades every later table scan — but a GB-scale
    *    micro-batch is no longer serialized through a single write
    *    task (the r12 throughput ceiling): `coalesce` caps parallelism
    *    without adding a shuffle, and the batch's cached row counts
    *    (needed by the visibility barrier anyway) price the sizing at
    *    zero extra scans.
    */
  def incrementalDedupSink(spark: SparkSession, db: String,
                           corpusTable: String, indexTable: String,
                           idCol: String, textCol: String,
                           shingleN: Int = 5, k: Int = 32, bands: Int = 8,
                           threshold: Double = 0.8,
                           rowsPerFile: Long = 1L << 20)
                          (onPairs: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    ensureTables(spark, db, corpusTable, indexTable, k)
    // VISIBILITY BARRIER state (r12): batch N+1 dedups against batches
    // 1..N only if its catalog-table reads SEE batch N's appends. That
    // visibility is supposed to be automatic, but a rare (~1%/batch
    // unmitigated, measured by graft.tools.IngestStress) staleness race
    // between insertInto's cache refresh machinery and the next read
    // served a one-batch-old snapshot — a silently weaker dedup. The
    // sink tracks the EXPECTED cumulative row count of both tables
    // (single-writer contract) and, after each batch's appends,
    // re-reads the counts through the same spark.table path the next
    // batch will use — refreshTable + bounded retries on mismatch,
    // loud failure if freshness can't be established. Parquet counts
    // are metadata-only jobs; the two tiny count jobs per trigger are
    // the price of a dedup index that is never silently behind.
    var expectedCorpus = spark.table(s"`$db`.`$corpusTable`").count()
    var expectedIndex = spark.table(s"`$db`.`$indexTable`").count()
    def awaitVisible(): Unit = TableSync.awaitVisible(spark,
      Seq(((db, corpusTable), expectedCorpus),
        ((db, indexTable), expectedIndex)))
    (batch: DataFrame, batchId: Long) => {
      // NO-DATA micro-batches (watermark/timeout bookkeeping triggers —
      // and any quiet period on a real source) must not pay the full
      // fixed per-trigger pipeline: 20 jobs + 2 table commits on zero
      // rows. One cheap isEmpty job exits with an empty pair frame.
      if (batch.isEmpty) onPairs(emptyPairs(spark), batchId)
      else {
        val b = batch.select(col(idCol).cast("long").as(idCol),
          col(textCol).cast("string").as(textCol)).persist()
        // mark so only THIS batch's operator-internal persists are
        // released afterwards — a long-running stream must not accrete
        // cached blocks across batches (r10 review: blocks were freed
        // but the per-batch DataFrame references accreted in the
        // registry for the stream's lifetime). r20: the mark is
        // THREAD-scoped and every operator checkpoint registers
        // through CacheScope, so the drain below releases exactly this
        // batch's blocks — the old getPersistentRDDs-diff sweep is
        // gone (it clobbered sibling sinks' in-flight blocks when
        // several sinks share one session).
        val scopeMark = graft.ops.CacheScope.mark(spark)
        try {
          val corpus = spark.table(s"`$db`.`$corpusTable`")
            .select(col("id").as(idCol), col("text").as(textCol))
          val index = spark.table(s"`$db`.`$indexTable`")
          val (pairs, newSigs) = Dedup.minhashLshIncrementalWithIndex(
            b, corpus, index, idCol, textCol, shingleN, k, bands, threshold,
            smallBatch = true)
          onPairs(pairs, batchId)
          import scala.concurrent.{Await, Future}
          import scala.concurrent.ExecutionContext.Implicits.global
          import scala.concurrent.duration.Duration
          // newSigs/b are persisted — these counts are cache-local
          // jobs, and they both feed the visibility barrier AND size
          // the append file counts (rows-proportional, floor 1)
          val nIdx = newSigs.count()
          val nCorpus = b.count()
          def nFiles(rows: Long): Int =
            math.max(1L, math.min(Int.MaxValue.toLong,
              (rows + rowsPerFile - 1) / rowsPerFile)).toInt
          val appendIndex = Future {
            newSigs.coalesce(nFiles(nIdx))
              .write.mode("append").insertInto(s"`$db`.`$indexTable`")
          }
          val appendCorpus = Future {
            b.select(col(idCol).as("id"), col(textCol).as("text"))
              .coalesce(nFiles(nCorpus))
              .write.mode("append").insertInto(s"`$db`.`$corpusTable`")
          }
          Await.result(appendIndex, Duration.Inf)
          Await.result(appendCorpus, Duration.Inf)
          expectedIndex += nIdx
          expectedCorpus += nCorpus
          awaitVisible()
        } finally {
          graft.ops.CacheScope.releaseSince(spark, scopeMark)
          b.unpersist()
          // ZOMBIE-ENTRY HYGIENE (the r12 flake, ~2%/batch in
          // IngestStress): the appends' recacheByPlan walk re-registers
          // cached entries referencing these tables behind the
          // tracker's back; a leftover entry canonically matches the
          // NEXT batch's freshly-listed scan (HadoopFsRelation equality
          // ignores file listings) and serves it the PREVIOUS batch's
          // table state. Cascade-drop everything referencing the two
          // tables so batch N+1 resolves them from disk. Driver-only.
          org.apache.spark.sql.graft.CatalogCache
            .uncacheReferencing(spark, s"`$db`.`$corpusTable`")
          org.apache.spark.sql.graft.CatalogCache
            .uncacheReferencing(spark, s"`$db`.`$indexTable`")
          ()
        }
      }
    }
  }

  /** Schema-correct empty pair frame (id_a, id_b, jaccard_e4) — zero
    * tasks to consume; handed to `onPairs` for no-data micro-batches so
    * the callback contract (one call per batch) holds.
    */
  private def emptyPairs(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id_a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("id_b",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("jaccard_e4",
          org.apache.spark.sql.types.LongType))))
}
