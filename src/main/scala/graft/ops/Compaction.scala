package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Small-file compaction — the reference's commented Spark utility
  * (rt-flink CommonTool.scala:168-244: read, union, `repartition(N)`,
  * insert back) as a first-class operator. At 100 TB the file count,
  * not the byte count, is what kills a metastore/scheduler; compaction
  * sizes output files to a target row count per file and writes
  * partition-aware.
  */
object Compaction {

  /** Rewrite `df` with ~`rowsPerFile` rows per output file, optionally
    * hive-partitioned by `partitionCols` — the AQE-era idiom for the
    * reference's manual `repartition(limits)`.
    *
    * Unpartitioned: plain round-robin `repartition(nFiles)`. Hive-
    * partitioned: hash-repartitioning on the partition columns alone
    * would send every row of a hot partition value to ONE task (one
    * giant file — the exact straggler compaction exists to fix), so
    * each partition value is split by a deterministic per-row salt
    * sized from its OWN row count (⌈rows/rowsPerFile⌉, from one cheap
    * pre-aggregation joined back by broadcast) — a hot date gets many
    * files, a small date exactly one.
    */
  def compactedWrite(df: DataFrame, outPath: String, rowsPerFile: Long,
                     partitionCols: Seq[String] = Nil): Unit = {
    // cache across the sizing count and the write — one scan of the
    // input, not two (the count's scan fills the cache the write reads)
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = cached.count()
      val nFiles = math.max(1, math.ceil(total.toDouble / rowsPerFile).toInt)
      val sized =
        if (partitionCols.isEmpty) cached.repartition(nFiles)
        else {
          val pc = partitionCols.map(col)
          val counts = cached.groupBy(pc: _*)
            .agg(ceil(count(lit(1)).cast("double") / rowsPerFile.toDouble)
              .cast("long").as("__files"))
          cached.join(broadcast(counts), partitionCols)
            .withColumn("__salt",
              pmod(xxhash64(cached.columns.map(col): _*),
                greatest(col("__files"), lit(1L))))
            .repartition(nFiles, pc :+ col("__salt"): _*)
            .drop("__files", "__salt")
        }
      val writer = sized.write.mode(SaveMode.Overwrite)
      (if (partitionCols.isEmpty) writer else writer.partitionBy(partitionCols: _*))
        .parquet(outPath)
    } finally { cached.unpersist(); () }
  }
}
