package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class TimeFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("trailing RANGE frame: inclusive boundary, same-instant rows together") {
    val df = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), 1.5),
      (2L, 7L, ts("2024-01-01 10:30:00"), 2.0),
      (3L, 7L, ts("2024-01-01 11:00:00"), 4.0),  // exactly 1h after e1: in frame
      (4L, 7L, ts("2024-01-01 11:00:00"), 8.0),  // same instant as e3: both see both
      (5L, 7L, ts("2024-01-01 12:00:01"), 16.0), // 1h+1s after e3/e4: alone
      (6L, 9L, ts("2024-01-01 10:30:00"), 32.0)  // other key
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeFeatures.trailingStats(df, "user_id", "ts", "value", 3600L)
      .select("event_id", "trail_n", "trail_sum_e6")
      .as[(Long, Long, Long)].collect()
      .map { case (e, n, s) => e -> ((n, s)) }.toMap
    assert(got(1L) == ((1L, 1500000L)))
    assert(got(2L) == ((2L, 3500000L)))
    // e3 and e4 share the instant: both frames hold e1..e4
    assert(got(3L) == ((4L, 15500000L)))
    assert(got(4L) == ((4L, 15500000L)))
    assert(got(5L) == ((1L, 16000000L)))
    assert(got(6L) == ((1L, 32000000L)))
  }
}
