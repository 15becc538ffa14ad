package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Retrieval

/** Streaming positional-postings maintenance — the phrase-query side
  * of the retrieval index family ([[Bm25Ingest]] maintains the scoring
  * index, this the positional one): each micro-batch of documents
  * tokenizes ONCE and appends its (term, doc_id, pos) rows; a phrase
  * query against the standing table
  * ([[graft.ops.Retrieval.phraseMatchFromIndex]]) is then byte-equal
  * to `phraseMatch` over every document ever ingested — postings rows
  * are position FACTS, trivially additive across disjoint batches
  * (spec-gated across slicings by `PhraseIngestSpec`; batch face:
  * q187).
  *
  * REPLAY SAFETY: one table, so the protocol is the Bm25Ingest
  * guard's degenerate case — the batch's own rows ARE the marker. A
  * parquet append is job-atomic (files land at commit), so a replayed
  * batchId is either fully present (skip) or fully absent (append);
  * there is no half-applied window to repair. A batch of zero-token
  * documents appends nothing and replays as nothing — idempotent
  * without a marker because the table IS the payload.
  *
  * Scale shape: per batch one tokenize of the BATCH, one
  * word-mass-sized append. At 100 TB the table is laid out
  * (partitioned/bucketed) by term, so a phrase query prunes to its
  * distinct words' buckets — the [[Bm25Ingest]] layout doctrine.
  */
object PhraseIngest {

  def ensureTable(spark: SparkSession, db: String, table: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$db`.`$table` " +
      "(`term` STRING, `doc_id` BIGINT, `pos` BIGINT, `__batch_id` BIGINT) " +
      "USING PARQUET")
  }

  /** foreachBatch sink over a document stream (columns `idCol`,
    * `textCol`). `onBatch(batchId, nPostings)` is the observability
    * hook.
    */
  def positionalIndexSink(spark: SparkSession, db: String, table: String,
                          idCol: String, textCol: String)
                         (onBatch: (Long, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    ensureTable(spark, db, table)
    val pTable = s"`$db`.`$table`"
    // visibility barrier — the Bm25Ingest/StreamingDedup doctrine
    var expected = spark.table(pTable).count()
    def awaitVisible(): Unit =
      TableSync.awaitVisible(spark, Seq(((db, table), expected)))
    (batch: DataFrame, batchId: Long) => {
      if (batch.isEmpty) onBatch(batchId, 0L)
      else {
        val applied = !spark.table(pTable)
          .filter(col("__batch_id") === batchId).isEmpty
        if (applied) onBatch(batchId, 0L) // replay: no-op
        else {
          val b = batch.select(col(idCol).cast("long").as(idCol),
            col(textCol).cast("string").as(textCol)).persist()
          try {
            val p = Retrieval.positionalPostings(b, idCol, textCol)
              .withColumn("__batch_id", lit(batchId))
              .localCheckpoint(true)
            val n = p.count()
            p.write.mode(SaveMode.Append).insertInto(pTable)
            expected += n
            awaitVisible()
            onBatch(batchId, n)
          } finally {
            b.unpersist()
            org.apache.spark.sql.graft.CatalogCache
              .uncacheReferencing(spark, pTable)
            ()
          }
        }
      }
    }
  }

  /** The standing index's query face: exact phrase match over every
    * document ever ingested.
    */
  def phraseMatch(spark: SparkSession, db: String, table: String,
                  phrase: Seq[String]): DataFrame =
    Retrieval.phraseMatchFromIndex(
      spark.table(s"`$db`.`$table`").drop("__batch_id"), phrase)
}
