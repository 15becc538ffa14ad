package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals the naive non-equi join, without a nested loop") {
    val points = (-500L to 500L by 7L).map(v => (v, s"p$v")).toDF("v", "ptag")
    val intervals = Seq(
      (1L, -100L, 50L), (2L, 0L, 0L), (3L, 40L, 400L),
      (4L, 300L, 310L), (5L, 600L, 700L), (6L, -450L, -449L))
      .toDF("iid", "lo", "hi")

    val fast = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 64L)
    val naive = points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")

    val fk = fast.select("v", "iid").as[(Long, Long)].collect().sorted.toSeq
    val nk = naive.select("v", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(fk == nk, s"fast=${fk.take(10)}... naive=${nk.take(10)}...")
    assert(fk.nonEmpty && fk.distinct == fk, "each match exactly once")

    // the point of the operator: an equi-join plan, not a nested loop
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(400))
  }

  test("intervalOverlap equals the naive overlap join, each pair once") {
    val left = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 200L, 300L),
      (4L, -80L, -10L)).toDF("lid", "llo", "lhi")
    val right = Seq((10L, 90L, 250L), (11L, 55L, 58L), (12L, 400L, 500L),
      (13L, -20L, 5L)).toDF("rid", "rlo", "rhi")
    val fast = RangeJoin.intervalOverlap(left, "llo", "lhi", right, "rlo", "rhi", 64L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val naive = left.join(right, $"llo" <= $"rhi" && $"rlo" <= $"lhi")
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(fast == naive, s"fast=$fast naive=$naive")
    assert(fast.distinct == fast, "each overlapping pair exactly once")
    // wide overlaps spanning many buckets still appear once
    assert(fast.contains((1L, 10L)) && fast.contains((3L, 10L)))
  }

  test("inclusive bounds and bucket-boundary points") {
    val points = Seq(0L, 63L, 64L, 128L).toDF("v")
    val intervals = Seq((1L, 64L, 128L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 64L)
      .select("v").as[Long].collect().sorted.toSeq
    assert(got == Seq(64L, 128L), s"got $got")
  }
}
