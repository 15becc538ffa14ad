package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write-cost probe for
  * [[graft.streaming.StreamingCc.incrementalCcMergeSink]] — the keyed
  * MERGE contract: with a FIXED delta, growing the STANDING label
  * table ×10 must grow the per-batch WRITE by ~nothing beyond bucket
  * granularity (rows written = touched buckets × bucket size, vs the
  * full-rewrite sink's rows written = the whole table). The read side
  * is partition-pruned the same way.
  *
  *   Test/runMain graft.tools.CcMergeProbe /root/testdata/sf0.1
  */
object CcMergeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val db = "graft_ccmerge_probe"
    val nBuckets = 1024
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    // the CcDeltaProbe delta: ~2% of docs, ~1.5 edges each
    val delta = docs
      .select(col("doc_id"),
        explode(sequence(lit(1L), lit(1L) + pmod(col("doc_id"), lit(2L)))).as("k"))
      .select(col("doc_id").as("id_a"),
        pmod(col("doc_id") * 37L + col("k") * 101L, lit(n)).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(pmod(col("id_a"), lit(500L)) === 0L)
      .localCheckpoint(true)
    val nDelta = delta.count()
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    for (mult <- Seq(1, 4, 10)) {
      val table = s"labels_x$mult"
      graft.streaming.StreamingCc.ensureBucketedTable(spark, db, table)
      val standing = (0 until mult).map { r =>
        spark.range(n).select(
          (col("id") + lit(r.toLong * 1000000000L)).as("id"),
          ((col("id") - pmod(col("id"), lit(10L))) +
            lit(r.toLong * 1000000000L)).as("label"))
      }.reduce(_ unionByName _)
        .select(col("id"), col("label"),
          pmod(xxhash64(col("id")), lit(nBuckets.toLong)).cast("int").as("bucket"))
      standing.write.mode("overwrite").insertInto(s"`$db`.`$table`")
      val nStanding = spark.table(s"`$db`.`$table`").count()
      var stats = (0L, 0L, 0L)
      val sink = graft.streaming.StreamingCc.incrementalCcMergeSink(
        spark, db, table, nBuckets = nBuckets) { (_, np, nc, nb) =>
        stats = (np, nc, nb); ()
      }
      val t0 = System.nanoTime()
      sink(delta, 0L)
      val wall = (System.nanoTime() - t0) / 1e9
      val (np, nChanged, nTouched) = stats
      // rows physically rewritten = the touched buckets' full content
      val touched = spark.table(s"`$db`.`$table`")
        .groupBy(col("bucket")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      // re-derive which buckets the changed ids hash to is not needed:
      // nTouched came from the sink; approximate written rows as
      // nTouched × mean bucket size (exact per-bucket sizes printed)
      val total = touched.values.sum
      val written = (nTouched * total) / math.max(1, touched.size)
      println(f"CCMERGE standing=$nStanding%-9d delta=$np changed=$nChanged " +
        f"touchedBuckets=$nTouched/$nBuckets rowsWritten~=$written " +
        f"fullRewriteWould=$total t=$wall%6.2f s")
      graft.ops.CacheScope.release(spark)
    }
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    spark.stop()
  }
}
