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
    */
  def incrementalDedupSink(spark: SparkSession, db: String,
                           corpusTable: String, indexTable: String,
                           idCol: String, textCol: String,
                           shingleN: Int = 5, k: Int = 32, bands: Int = 8,
                           threshold: Double = 0.8)
                          (onPairs: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      ensureTables(spark, db, corpusTable, indexTable, k)
      val b = batch.select(col(idCol).cast("long").as(idCol),
        col(textCol).cast("string").as(textCol)).persist()
      // snapshot so only THIS batch's operator-internal persists are
      // released afterwards — a long-running stream must not accrete
      // cached blocks across batches
      val preexisting = spark.sparkContext.getPersistentRDDs.keySet
      try {
        val corpus = spark.table(s"`$db`.`$corpusTable`")
          .select(col("id").as(idCol), col("text").as(textCol))
        val index = spark.table(s"`$db`.`$indexTable`")
        val pairs = Dedup.minhashLshIncremental(b, corpus, index,
          idCol, textCol, shingleN, k, bands, threshold)
        onPairs(pairs, batchId)
        Dedup.buildMinhashIndex(b, idCol, textCol, shingleN, k)
          .write.mode("append").insertInto(s"`$db`.`$indexTable`")
        b.select(col(idCol).as("id"), col(textCol).as("text"))
          .write.mode("append").insertInto(s"`$db`.`$corpusTable`")
      } finally {
        spark.sparkContext.getPersistentRDDs
          .filter { case (rddId, _) => !preexisting.contains(rddId) }
          .values.foreach(_.unpersist(blocking = false))
        b.unpersist()
        ()
      }
    }
}
