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

  test("a hot partition value is split across files instead of one giant straggler") {
    val dir = Files.createTempDirectory("compacts").toString
    // 9:1 skew: dt=hot has 900 rows, dt=cold has 100
    val df = (1L to 1000L)
      .map(i => (i, s"payload $i", if (i <= 900) "hot" else "cold"))
      .toDF("id", "v", "dt")
    Compaction.compactedWrite(df, s"$dir/out", rowsPerFile = 250,
      partitionCols = Seq("dt"))
    def parquets(sub: String) = new java.io.File(s"$dir/out/$sub").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    // hot: ceil(900/250) = 4 salt buckets → up to 4 files, and at least
    // 2 (one file would mean the salt never split the hot value)
    assert(parquets("dt=hot").length >= 2 && parquets("dt=hot").length <= 4,
      s"hot partition files: ${parquets("dt=hot").length}")
    // cold: one salt bucket → exactly one file
    assert(parquets("dt=cold").length == 1,
      s"cold partition files: ${parquets("dt=cold").length}")
    assert(spark.read.parquet(s"$dir/out").count() == 1000L)
  }

  test("rows with a NULL partition value are written, not silently dropped") {
    val dir = Files.createTempDirectory("compactn").toString
    val df = (1L to 100L)
      .map(i => (i, if (i <= 10) null else if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "par")
    Compaction.compactedWrite(df, s"$dir/out", rowsPerFile = 1000,
      partitionCols = Seq("par"))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 100L, s"row count after round-trip: ${back.count()}")
    // Hive convention: NULL partition values land in the default-partition dir
    val subdirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs.contains("par=__HIVE_DEFAULT_PARTITION__"),
      s"missing NULL-partition dir, got $subdirs")
    assert(back.where($"par".isNull).count() == 10L)
  }

  test("a frame with a map column compacts (salt skips unhashable types)") {
    val dir = Files.createTempDirectory("compactm").toString
    val df = (1L to 60L)
      .map(i => (i, Map("k" -> i), if (i % 2 == 0) "a" else "b"))
      .toDF("id", "m", "par")
    Compaction.compactedWrite(df, s"$dir/out", rowsPerFile = 10,
      partitionCols = Seq("par"))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 60L)
    assert(back.select("id").as[Long].collect().toSet == (1L to 60L).toSet)
  }
}
