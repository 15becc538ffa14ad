package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical data layout for 100 TB parquet corpora.
  *
  * How bytes land on disk decides every later scan. Three levers, all
  * applied at write time so every downstream reader benefits:
  *
  *  - '''Range clustering''': `repartitionByRange` on the cluster key
  *    makes files globally range-disjoint, so parquet footer min/max
  *    statistics prune entire FILES for point/range predicates — the
  *    read-side win that hash partitioning can never give.
  *  - '''In-file ordering''': `sortWithinPartitions` tightens per-row-
  *    group min/max (row-group pruning inside surviving files) and
  *    feeds parquet's RLE/delta encodings runs instead of noise —
  *    routinely 2-5× smaller files on timestamp/id columns.
  *  - '''File sizing''': `maxRecordsPerFile` caps the tail (one hot
  *    range partition must not become a 50 GB file), while choosing
  *    `numFiles` ≈ totalBytes / 512 MB avoids the small-file problem
  *    that drowns a NameNode/object store in per-file overhead.
  *
  * Hive-style directory partitioning (`partitionBy`) composes with
  * clustering: partition by the coarse pruning dimension (ingest date),
  * cluster within each partition by the fine one (doc_id / ts).
  */
object Layout {

  /** Write `df` range-clustered and sorted on `sortCols`, in about
    * `numFiles` range-disjoint files, each at most `maxRecordsPerFile`
    * rows (0 = uncapped). The range boundaries come from Spark's
    * reservoir sample of the key — skewed keys still land balanced.
    */
  def writeClustered(df: DataFrame, path: String, sortCols: Seq[String],
                     numFiles: Int, maxRecordsPerFile: Long = 0L): Unit = {
    require(sortCols.nonEmpty && numFiles > 0)
    val cols = sortCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Write the corpus in deterministic epoch-shuffled training order:
    * range-partition and sort by [[Sampling.epochShuffleKey]], so
    * reading the files in range order IS the epoch's shuffled order —
    * no permutation table, no driver-side shuffle, reproducible across
    * retries, and a different (equally reproducible) order per epoch.
    */
  def writeShuffled(df: DataFrame, path: String, idCol: String,
                    epoch: Int, numFiles: Int): Unit = {
    require(numFiles > 0)
    df.withColumn("__shuf", Sampling.epochShuffleKey(col(idCol), epoch))
      .repartitionByRange(numFiles, col("__shuf"))
      .sortWithinPartitions(col("__shuf"), col(idCol))
      .drop("__shuf")
      .write.mode("overwrite").parquet(path)
  }

  /** Hive-style directory partitioning on `partCols` (the coarse prune:
    * a `WHERE dt = ...` never lists the other directories), clustered
    * and sorted on `sortCols` within each partition. One range shuffle
    * total — the partition columns lead the range key so each output
    * task writes into few directories instead of all of them (the
    * many-partitions × many-tasks small-file explosion).
    */
  def writePartitionedClustered(df: DataFrame, path: String,
                                partCols: Seq[String], sortCols: Seq[String],
                                filesPerPartition: Int): Unit = {
    require(partCols.nonEmpty && sortCols.nonEmpty && filesPerPartition > 0)
    val key = (partCols ++ sortCols).map(col)
    val distinctParts = df.select(partCols.map(col): _*).distinct().count()
    df.repartitionByRange((distinctParts * filesPerPartition).toInt max 1, key: _*)
      .sortWithinPartitions(key: _*)
      .write.mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(path)
  }
}
