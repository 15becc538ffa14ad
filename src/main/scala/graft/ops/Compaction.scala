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
    * hive-partitioned by `partitionCols`. Uses `repartition` (round-
    * robin within partitions of the partition columns) so output files
    * are evenly sized — the AQE-era idiom for the reference's manual
    * `repartition(limits)`.
    */
  def compactedWrite(df: DataFrame, outPath: String, rowsPerFile: Long,
                     partitionCols: Seq[String] = Nil): Unit = {
    // cache across the sizing count and the write — one scan of the
    // input, not two (the count's scan fills the cache the write reads)
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = cached.count()
      val nFiles = math.max(1, math.ceil(total.toDouble / rowsPerFile).toInt)
      val writer =
        (if (partitionCols.isEmpty) cached.repartition(nFiles)
         else cached.repartition(nFiles, partitionCols.map(col): _*))
          .write.mode(SaveMode.Overwrite)
      (if (partitionCols.isEmpty) writer else writer.partitionBy(partitionCols: _*))
        .parquet(outPath)
    } finally { cached.unpersist(); () }
  }
}
