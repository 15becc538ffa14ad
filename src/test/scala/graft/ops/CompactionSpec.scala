package graft.ops

import java.nio.file.Files

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compactedWrite produces the expected file count and preserves rows") {
    val dir = Files.createTempDirectory("compact").toString
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v").repartition(16)
    Compaction.compactedWrite(df, s"$dir/out", rowsPerFile = 250)
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, s"expected 4 files, got ${files.length}")
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 1000L)
    assert(back.select("id").as[Long].collect().toSet == (1L to 1000L).toSet)
  }

  test("partition-aware compaction writes hive-style directories") {
    val dir = Files.createTempDirectory("compactp").toString
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "par")
    Compaction.compactedWrite(df, s"$dir/out", rowsPerFile = 1000,
      partitionCols = Seq("par"))
    val subdirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs == Set("par=even", "par=odd"))
    assert(spark.read.parquet(s"$dir/out").count() == 100L)
  }
}
