package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.Quality

/** The end-to-end streaming training-data ingest loop: each micro-batch
  * is quality-gated, PII-scrubbed, and near-dup-checked against every
  * document accepted in any earlier batch, then folded into the corpus
  * — the LLM-pipeline face of the reference's CDC ingest loop (gate ≈
  * validity filter, redact ≈ type normalization, dedup-index ≈ dim
  * store; rt-flink OdsBaseDbApp.scala:92-119).
  *
  * Ordering matters and is part of the contract: the gate runs FIRST
  * (rejected docs must not pollute the dedup index or pair stream) and
  * redaction runs BEFORE dedup (so the stored corpus never contains raw
  * PII, and near-dup comparison sees exactly what later consumers
  * read). Gate and redaction are narrow codegen'd projections — the
  * per-batch cost stays the incremental dedup's.
  */
object IngestPipeline {

  /** foreachBatch sink: gate → redact → incremental dedup → index/corpus
    * append. `onBatch(cleanPairs, droppedCount, batchId)` receives the
    * batch's near-dup pairs (vs all history) and how many rows the gate
    * dropped; it must materialize `cleanPairs` before returning.
    */
  def trainingIngestSink(spark: SparkSession, db: String,
                         corpusTable: String, indexTable: String,
                         idCol: String, textCol: String,
                         shingleN: Int = 5, k: Int = 32, bands: Int = 8,
                         threshold: Double = 0.8)
                        (onBatch: (DataFrame, Long, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val gated = batch
        .withColumn("__reason", Quality.gateReason(col(textCol)))
        .persist()
      val dropped = gated.filter(col("__reason") =!= "keep").count()
      val cleaned = gated.filter(col("__reason") === "keep")
        .drop("__reason")
        .withColumn(textCol, TextFunctions.redactPii(col(textCol)))
      val dedup = StreamingDedup.incrementalDedupSink(spark, db,
        corpusTable, indexTable, idCol, textCol,
        shingleN, k, bands, threshold) {
        (pairs, id) => onBatch(pairs, dropped, id)
      }
      try dedup(cleaned, batchId)
      finally { gated.unpersist(); () }
    }
  }
}
