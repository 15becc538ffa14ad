package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleLocfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gaps fill with the carried value; observed flags mark real cells") {
    val df = Seq(
      (7L, ts("2024-01-01 00:05:00"), 10.5),
      (7L, ts("2024-01-01 00:20:00"), 12.0), // same 30-min cell: max wins
      (7L, ts("2024-01-01 02:10:00"), 3.25), // 3 empty cells before this
      (9L, ts("2024-01-01 00:00:00"), 1.0)   // other key: own 1-cell grid
    ).toDF("k", "ts", "v")
    val got = TimeFeatures.resampleLocf(df, "k", "ts", "v", stepSeconds = 1800L)
      .orderBy("k", "bucket")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    val base = ts("2024-01-01 00:00:00").getTime / 1000 / 1800
    assert(got == Seq(
      (7L, base, 12000000L, 2L, true),
      (7L, base + 1, 12000000L, 0L, false),
      (7L, base + 2, 12000000L, 0L, false),
      (7L, base + 3, 12000000L, 0L, false),
      (7L, base + 4, 3250000L, 1L, true),
      (9L, base, 1000000L, 1L, true)), got.toString)
  }

  test("a key spanning more than maxBuckets cells fails loudly, not silently") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-09 00:00:00"), 2.0) // 8 days of hourly cells > 100
    ).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      TimeFeatures.resampleLocf(df, "k", "ts", "v", stepSeconds = 3600L, maxBuckets = 100L)
        .collect()
    }
    assert(e.getMessage.contains("spans more than"), e.getMessage)
  }

  test("grid rows carry no text and the corpus shuffles once (agg) — cells/grid/join co-key") {
    val df = Seq((7L, ts("2024-01-01 00:05:00"), 10.5)).toDF("k", "ts", "v")
    val plan = TimeFeatures.resampleLocf(df, "k", "ts", "v", 1800L)
      .queryExecution.executedPlan.toString
    // input agg shuffle + grid-bounds agg + LOCF window: all hash by k
    // or (k, bucket); no broadcast-nested-loop, no cartesian
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
  }
}
