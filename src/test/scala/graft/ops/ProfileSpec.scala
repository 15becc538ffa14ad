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

  test("zscore outliers: hand-computed moments, group independence, degenerate groups") {
    // group A: values 1,1,1,1,101 (cents 100..10100): mean 2100,
    // var = (5*Σc² - (Σc)²)/(5·4) = exact; the 101 sits z ≈ +1.789 —
    // so at zE4=17000 only it flags. Group B constant: zero variance,
    // no outliers. Group C singleton: n<2, no outliers.
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 1.0), (4L, "a", 1.0),
      (5L, "a", 101.0),
      (6L, "b", 7.0), (7L, "b", 7.0),
      (8L, "c", 42.0)
    ).toDF("id", "grp", "v")
    val got = Profile.zscoreOutliers(df, "id", "v", "grp", zE4 = 17000L)
      .select("id", "z_e4").as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(5L), got.toString)
    // S1 = 10500, S2 = 102050000; n·S2 − S1² = 400000000; var = 2e7;
    // z = 40000 / (5·√2e7) = 1.7888543819998317 -> floor e4 17888
    assert(got(5L) == 17888L, got.toString)
    // a NULL value must not inflate n against the sums: a constant
    // group plus one NULL has NO variance, so no outliers (r11 review)
    val withNull = Seq(
      (1L, "g", Some(5.0)), (2L, "g", Some(5.0)), (3L, "g", None)
    ).toDF("id", "grp", "v")
    assert(Profile.zscoreOutliers(withNull, "id", "v", "grp", zE4 = 1L).count() == 0)
  }

  test("all-null and empty-table edges") {
    val allNull = Seq((None: Option[String]), None).toDF("s")
    val r = Profile.summarize(allNull).collect().head
    assert(r.getLong(1) == 2 && r.getLong(2) == 2 && r.getLong(3) == 0)
    assert(r.isNullAt(4) && r.isNullAt(5))
    val empty = Profile.summarize(spark.emptyDataFrame.withColumn("x", lit(1)).filter(lit(false)))
    assert(empty.count() == 1) // one row for column x, n_rows 0
  }

  test("quantiles: exact rank selection matches the hand-applied contract") {
    // 10 values with ties and a null; non-null n = 10 (sorted:
    // 1,2,2,3,5,5,5,8,9,10). rank(q) = clamp(ceil(q·n/1e6), 1, n):
    // q=100000 -> r1 -> 1; q=250000 -> r3 -> 2; q=500000 -> r5 -> 5;
    // q=750000 -> r8 (ceil 7.5) -> 8; q=1000000 -> r10 -> 10.
    val df = Seq[Option[Int]](Some(5), Some(2), Some(9), Some(1), Some(5),
      Some(3), Some(10), Some(2), Some(8), None, Some(5)).toDF("x")
    val got = Profile.quantiles(df, Seq("x"),
      qE6 = Seq(100000L, 250000L, 500000L, 750000L, 1000000L))
      .as[(String, Long, String)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got == Map(
      100000L -> "1.000000", 250000L -> "2.000000", 500000L -> "5.000000",
      750000L -> "8.000000", 1000000L -> "10.000000"), got.toString)
  }

  test("quantiles: ranks survive many range partitions (offsets + pruning)") {
    // 1..1000 over the default 8 shuffle partitions: median rank 500
    // -> value 500; q990000 -> rank 990
    val df = spark.range(1, 1001).toDF("v")
      .select($"v", ($"v" % 7).as("noise"))
    val got = Profile.quantiles(df, Seq("v"),
      qE6 = Seq(500000L, 990000L))
      .as[(String, Long, String)].collect().map(r => r._2 -> r._3).toMap
    assert(got == Map(500000L -> "500.000000", 990000L -> "990.000000"),
      got.toString)
  }

  test("quantiles: all-null column yields null values, not a crash") {
    val df = Seq[Option[Int]](None, None).toDF("x")
    val got = Profile.quantiles(df, Seq("x"), qE6 = Seq(500000L)).collect()
    assert(got.length == 1 && got.head.isNullAt(2), got.mkString(","))
  }

  test("quantiles: approx path shares the schema and lands near exact") {
    val df = spark.range(1, 10001).toDF("v")
    val ex = Profile.quantiles(df, Seq("v"), qE6 = Seq(500000L))
      .collect().head.getString(2).takeWhile(_ != '.').toLong
    val ap = Profile.quantiles(df, Seq("v"), qE6 = Seq(500000L),
      exact = false).collect().head.getString(2).takeWhile(_ != '.').toLong
    assert(math.abs(ex - ap) <= 50, s"exact $ex approx $ap")
  }

  test("correlation: moment replay matches Scala; nulls and degenerate groups drop") {
    val df = Seq(
      ("a", jd(1.0), jd(2.1)), ("a", jd(2.0), jd(3.9)),
      ("a", jd(3.0), jd(6.2)), ("a", jd(4.0), jd(7.8)),
      ("a", null.asInstanceOf[java.lang.Double], jd(99.0)), // excluded row
      ("b", jd(1.0), jd(5.0)), ("b", jd(2.0), jd(5.0)),     // zero y-variance
      ("c", jd(1.0), jd(1.0))                                // n < 2
    ).toDF("g", "x", "y")
    val got = Profile.correlation(df, "g", "x", "y")
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, n, c, s) => g -> ((n, c, s)) }.toMap
    // replay group a with the exact same operation order in Scala
    val pts = Seq((1.0, 2.1), (2.0, 3.9), (3.0, 6.2), (4.0, 7.8))
    val cx = pts.map(p => math.round(p._1 * 10000.0))
    val cy = pts.map(p => math.round(p._2 * 10000.0))
    val n = BigInt(pts.size)
    val (sx, sy) = (cx.map(BigInt(_)).sum, cy.map(BigInt(_)).sum)
    val sxx = cx.map(c => BigInt(c) * c).sum
    val syy = cy.map(c => BigInt(c) * c).sum
    val sxy = cx.zip(cy).map { case (a, b) => BigInt(a) * b }.sum
    val covnum = (n * sxy - sx * sy).toDouble
    val varx = (n * sxx - sx * sx).toDouble
    val vary = (n * syy - sy * sy).toDouble
    val corrE4 = math.floor(10000.0 * (covnum / (math.sqrt(varx) * math.sqrt(vary)))).toLong
    val slopeE6 = math.floor(1000000.0 * (covnum / varx)).toLong
    assert(got == Map("a" -> ((4L, corrE4, slopeE6))), got.toString)
    assert(corrE4 > 9900L && corrE4 <= 10000L, s"near-linear fixture: $corrE4")
  }

  private def jd(d: Double): java.lang.Double = java.lang.Double.valueOf(d)

  test("winsorize: rank-contract bounds clip per group; nulls and singletons") {
    val rows = (1L to 10L).map(i => (i, "a", jd(i.toDouble))) ++ Seq(
      (11L, "a", null.asInstanceOf[java.lang.Double]), // excluded
      (12L, "b", jd(42.0)))                            // singleton group
    val got = Profile.winsorize(rows.toDF("id", "g", "v"), "id", "v", "g",
        loE6 = 250000L, hiE6 = 750000L)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    // group a, n=10: lo rank ceil(2.5)=3 -> 3.0, hi rank ceil(7.5)=8 -> 8.0
    assert(got(1L) == 3000000L && got(2L) == 3000000L && got(3L) == 3000000L)
    assert(got(5L) == 5000000L, got.toString)
    assert(got(8L) == 8000000L && got(9L) == 8000000L && got(10L) == 8000000L)
    assert(!got.contains(11L), "null value must not appear in the output")
    // singleton: both targets clamp to rank 1 -> clipped to itself
    assert(got(12L) == 42000000L, got.toString)
  }
}
