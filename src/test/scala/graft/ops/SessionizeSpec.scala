package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions break on gaps strictly over the threshold; per-key independence") {
    val df = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:29:00")), // 29 min: same session
      (3L, 7L, ts("2024-01-01 10:59:00")), // exactly 30 min: same (strict >)
      (4L, 7L, ts("2024-01-01 11:29:01")), // 30 min 1 s: breaks
      (5L, 9L, ts("2024-01-01 10:00:00"))  // other user: own session 1
    ).toDF("event_id", "user_id", "ts")
    val got = Sessionize.assignSessions(df, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_seq", "is_session_start")
      .as[(Long, Long, Boolean)].collect()
      .map { case (e, s, st) => e -> ((s, st)) }.toMap
    assert(got(1L) == ((1L, true)))
    assert(got(2L) == ((1L, false)))
    assert(got(3L) == ((1L, false)))
    assert(got(4L) == ((2L, true)))
    assert(got(5L) == ((1L, true)))
  }

  test("same-timestamp events order by the tie column deterministically") {
    val t0 = ts("2024-01-01 10:00:00")
    val df = Seq((20L, 1L, t0), (10L, 1L, t0)).toDF("event_id", "user_id", "ts")
    val got = Sessionize.assignSessions(df, "user_id", "ts", "event_id", 1800L)
      .orderBy("session_seq", "event_id")
      .select("event_id", "is_session_start").as[(Long, Boolean)].collect().toSeq
    // the lower event_id is the session start; both share session 1
    assert(got == Seq((10L, true), (20L, false)), got.toString)
  }

  test("one exchange: both windows share the partitioning") {
    val df = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val plan = Sessionize.assignSessions(df, "user_id", "ts", "event_id", 1800L)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected one shuffle, plan:\n${plan.take(800)}")
  }
}
