package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some(2.5), Some("a"), Seq(1.0f)),
    (2L, None, Some("b"), Seq(2.0f)),
    (3L, Some(10.0), None, Seq(3.0f)),
    (4L, Some(2.5), Some("a"), Seq(4.0f))
  ).toDF("id", "score", "tag", "vec")

  test("counts, nulls, exact distincts, and canonical min/max per column") {
    val got = Profile.summarize(fixture).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = got("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 4)
    assert(id.getString(4) == "1.000000" && id.getString(5) == "4.000000")
    val score = got("score")
    assert(score.getLong(2) == 1)       // one null
    assert(score.getLong(3) == 2)       // 2.5 and 10.0, nulls excluded
    assert(score.getString(4) == "2.500000" && score.getString(5) == "10.000000")
    val tag = got("tag")
    assert(tag.getLong(2) == 1 && tag.getLong(3) == 2)
    assert(tag.getString(4) == "a" && tag.getString(5) == "b")
    // non-atomic column: counts only, stats null
    val vec = got("vec")
    assert(vec.getLong(1) == 4 && vec.getLong(2) == 0)
    assert(vec.isNullAt(3) && vec.isNullAt(4) && vec.isNullAt(5))
  }

  test("approx mode emits an estimate without the exact multi-distinct Expand") {
    val got = Profile.summarize(fixture, exact = false).collect()
      .map(r => r.getString(0) -> r).toMap
    // HLL on 4 values is exact in practice; the contract is non-null
    assert(got("id").getLong(3) == 4)
    // and the NAME of this test is a plan property — assert it
    val approxPlan = Profile.wideAgg(fixture, exact = false)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan.take(400))
    val exactPlan = Profile.wideAgg(fixture, exact = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), "exact multi-distinct should Expand")
  }

  test("histogram bins, under/overflow, zero-filled spine") {
    val df = Seq(-5.0, 0.0, 9.99, 10.0, 25.0, 100.0, 250.0).toDF("x")
    val got = Profile.histogram(df, "x", lo = 0.0, hi = 100.0, nBins = 4)
      .orderBy("bin")
      .select("bin", "n").as[(Int, Long)].collect().toSeq
    // bins of width 25: [-1: -5], [0: 0, 9.99, 10], [1: 25], [2,3: empty],
    // [4 overflow: 100, 250] — 100.0 lands in overflow (hi exclusive)
    assert(got == Seq((-1, 1L), (0, 3L), (1, 1L), (2, 0L), (3, 0L), (4, 2L)), got.toString)
    val edges = Profile.histogram(df, "x", 0.0, 100.0, 4)
      .filter(col("bin") === 1).select("lo_edge", "hi_edge")
      .as[(Double, Double)].head()
    assert(edges == ((25.0, 50.0)))
  }

  test("all-null and empty-table edges") {
    val allNull = Seq((None: Option[String]), None).toDF("s")
    val r = Profile.summarize(allNull).collect().head
    assert(r.getLong(1) == 2 && r.getLong(2) == 2 && r.getLong(3) == 0)
    assert(r.isNullAt(4) && r.isNullAt(5))
    val empty = Profile.summarize(spark.emptyDataFrame.withColumn("x", lit(1)).filter(lit(false)))
    assert(empty.count() == 1) // one row for column x, n_rows 0
  }
}
