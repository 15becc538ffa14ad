package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("out").toString

  test("writeClustered: range-disjoint files, sorted within each file") {
    val df = (0L until 10000L).map(i => ((i * 7919L) % 10000L, s"p$i"))
      .toDF("k", "payload")
    val path = tmp("layout-clustered")
    Layout.writeClustered(df, path, Seq("k"), numFiles = 8)

    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length == 8, s"expected 8 range files, got ${files.length}")

    // per-file [min, max] of the cluster key must not overlap across
    // files — the property that lets footer stats prune whole files
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("k"), max("k")).as[(Long, Long)].head()
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"file ranges overlap: hi=$hiA vs next lo=$loB")
      case _ => ()
    }

    // sorted within each file: parquet preserves row order per file, so
    // reading one file back yields the key non-decreasing
    val one = spark.read.parquet(files.head).select("k").as[Long].collect()
    assert(one.sameElements(one.sorted), "rows inside a file are not sorted")

    // nothing lost
    assert(spark.read.parquet(path).count() == 10000L)
  }

  test("writeClustered: maxRecordsPerFile caps a hot partition's file size") {
    // all rows share one key → one range partition; the cap must split it
    val df = (0L until 5000L).map(i => (1L, i)).toDF("k", "v")
    val path = tmp("layout-cap")
    Layout.writeClustered(df, path, Seq("k"), numFiles = 2, maxRecordsPerFile = 1000L)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 5, s"cap not applied: ${files.length} files")
    files.foreach { f =>
      assert(spark.read.parquet(f.toString).count() <= 1000L)
    }
  }

  test("writeShuffled: file-range order IS the epoch's shuffle, per-epoch distinct") {
    val df = (0L until 2000L).map(i => (i, s"d$i")).toDF("id", "payload")
    val p1 = tmp("shuf-e1"); val p2 = tmp("shuf-e2")
    Layout.writeShuffled(df, p1, "id", epoch = 1, numFiles = 4)
    Layout.writeShuffled(df, p2, "id", epoch = 2, numFiles = 4)

    // read the dataset ordered by the epoch key and compare against the
    // per-file concatenation in range order
    val expected1 = df.withColumn("k", Sampling.epochShuffleKey($"id", 1))
      .orderBy("k", "id").select("id").as[Long].collect().toSeq
    val files1 = new java.io.File(p1).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    val chunks1 = files1.map { f =>
      spark.read.parquet(f).withColumn("k", Sampling.epochShuffleKey($"id", 1))
        .select("k", "id").as[(Long, Long)].collect().toSeq
    }.sortBy(c => c.head._1)
    chunks1.foreach { c => assert(c == c.sortBy(identity), "rows sorted in-file") }
    assert(chunks1.flatten.map(_._2).toSeq == expected1,
      "concatenating files in range order must replay the epoch order")

    // same epoch → identical layout; different epoch → different order
    val all1 = spark.read.parquet(p1).select("id").as[Long].collect().sorted
    val all2 = spark.read.parquet(p2).select("id").as[Long].collect().sorted
    assert(all1.sameElements(all2), "no rows lost")
    val e2order = df.withColumn("k", Sampling.epochShuffleKey($"id", 2))
      .orderBy("k", "id").select("id").as[Long].collect().toSeq
    assert(expected1 != e2order)
  }

  test("writePartitionedClustered: directory per partition value, pruned scan") {
    val df = (0L until 3000L)
      .map(i => (s"2026-01-0${i % 3 + 1}", i, s"u${i % 97}"))
      .toDF("dt", "id", "user")
    val path = tmp("layout-part")
    Layout.writePartitionedClustered(df, path, Seq("dt"), Seq("id"),
      filesPerPartition = 2)

    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("dt=2026-01-01", "dt=2026-01-02", "dt=2026-01-03"))

    // partition pruning: a dt predicate reads only its directory
    val pruned = spark.read.parquet(path).filter($"dt" === "2026-01-02")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(500))
    assert(pruned.count() == 1000L)
    assert(spark.read.parquet(path).count() == 3000L)
  }
}
