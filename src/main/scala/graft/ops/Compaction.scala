package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

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
            // rename the join keys so the join can be null-safe (<=>): a
            // USING join on the bare names would drop NULL-partition rows
            // (NULL = NULL is not true), silently losing the rows Hive
            // would have written to __HIVE_DEFAULT_PARTITION__
            .toDF(partitionCols.map("__pc_" + _) :+ "__files": _*)
          val joinCond = partitionCols
            .map(c => col(c) <=> col("__pc_" + c)).reduce(_ && _)
          cached.join(broadcast(counts), joinCond)
            .withColumn("__salt",
              pmod(saltHash(cached), greatest(col("__files"), lit(1L))))
            .repartition(nFiles, pc :+ col("__salt"): _*)
            .drop(partitionCols.map("__pc_" + _) :+ "__files" :+ "__salt": _*)
        }
      val writer = sized.write.mode(SaveMode.Overwrite)
      (if (partitionCols.isEmpty) writer else writer.partitionBy(partitionCols: _*))
        .parquet(outPath)
    } finally { cached.unpersist(); () }
  }

  /** Deterministic per-row salt source. `xxhash64` rejects MapType at
    * analysis (maps have no canonical order), so hash only the columns
    * whose types contain no map anywhere; if every column is map-bearing,
    * fall back to a per-partition row counter (still spreads rows, just
    * not stable across different input partitionings — acceptable for a
    * salt whose only job is file sizing).
    */
  private def saltHash(df: DataFrame): Column = {
    def mapFree(dt: DataType): Boolean = dt match {
      case _: MapType      => false
      case a: ArrayType    => mapFree(a.elementType)
      case s: StructType   => s.fields.forall(f => mapFree(f.dataType))
      case _               => true
    }
    val hashable = df.schema.fields.filter(f => mapFree(f.dataType)).map(f => col(f.name))
    if (hashable.nonEmpty) xxhash64(hashable.toIndexedSeq: _*)
    else monotonically_increasing_id()
  }
}
