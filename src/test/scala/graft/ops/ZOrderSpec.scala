package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the scalar Morton reference on a grid") {
    val rows = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = rows.toDF("a", "b")
      .withColumn("z", ZOrder.zValue($"a", $"b", 4))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == mortonRef(a, b, 4), s"($a,$b): got $z")
    }
    // the code is a bijection on the grid
    assert(got.map(_._3).distinct.length == 256)
  }

  test("zValue round-trips: every input bit is recoverable from the code") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq((0L, 0L), ((1L << 31) - 1, (1L << 31) - 1), (0L, (1L << 31) - 1)) ++
      Seq.fill(2000)((rnd.nextLong().abs % (1L << 31), rnd.nextLong().abs % (1L << 31)))
    val got = pairs.toDF("a", "b")
      .withColumn("z", ZOrder.zValue($"a", $"b", 31))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == mortonRef(a, b, 31), s"($a,$b)")
      // decode: de-interleave must give back the inputs
      var da = 0L; var db = 0L
      (0 until 31).foreach { i =>
        da |= ((z >> (2 * i)) & 1L) << i
        db |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(da == a && db == b, s"decode($z) = ($da,$db) != ($a,$b)")
    }
  }

  test("zValueSql replays zValue exactly") {
    val df = (0L until 200L).map(i => (i % 32, (i * 7) % 32)).toDF("a", "b")
    df.createOrReplaceTempView("zt")
    val viaSql = spark.sql(
      s"SELECT a, b, ${ZOrder.zValueSql("a", "b", 5)} AS z FROM zt")
    val viaCol = df.withColumn("z2", ZOrder.zValue($"a", $"b", 5))
    assert(viaSql.join(viaCol, Seq("a", "b")).filter($"z" =!= $"z2").count() == 0)
  }

  test("writeZClustered: every file covers a small (a, b) box") {
    // 64x64 grid, 16 z-range files → each file's bounding box must be a
    // small fraction of the 4096-cell domain (the two-dim pruning win;
    // single-key range clustering would give full-width boxes on b)
    val rows = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val path = Files.createTempDirectory("zorder").resolve("out").toString
    ZOrder.writeZClustered(rows.toDF("a", "b"), path, "a", "b", 6, 16)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 16)
    files.foreach { f =>
      val (loA, hiA, loB, hiB) = spark.read.parquet(f.toString)
        .agg(min("a"), max("a"), min("b"), max("b"))
        .as[(Long, Long, Long, Long)].head()
      val area = (hiA - loA + 1) * (hiB - loB + 1)
      assert(area <= 1024, s"file box too large: [$loA,$hiA]x[$loB,$hiB] = $area")
    }
    assert(spark.read.parquet(path).count() == 4096L)
  }
}
