package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Graph.pageRank]] against hand-computed integer arithmetic: the
  * symmetric cycle must be a FIXED POINT of the e12 fixed-point
  * update (mass-stability of the integer form), and an asymmetric
  * star must reproduce exact hand-derived scores per round.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def scores(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val df = edges.toDF("src", "dst")
    val out = Graph.pageRank(df, "src", "dst", iters)
      .as[(Long, Long)].collect().toMap
    CacheScope.release(spark)
    out
  }

  test("3-cycle is a fixed point: init = tele + damped share exactly") {
    // init 10^12 div 3 = 333333333333; rate = (·85) div 100 =
    // 283333333333; tele = 15·10^12 div 300 = 50000000000; sum is the
    // init again — stable at any iteration count
    val cyc = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    for (it <- Seq(1, 4)) {
      val s = scores(cyc, it)
      assert(s === Map(1L -> 333333333333L, 2L -> 333333333333L,
        3L -> 333333333333L))
    }
  }

  test("asymmetric star: exact hand-computed scores after 1 and 2 rounds") {
    // a=1 → {b=2, c=3}, b → a, c → a; outdeg a=2, b=c=1
    val star = Seq(1L -> 2L, 1L -> 3L, 2L -> 1L, 3L -> 1L)
    val s1 = scores(star, 1)
    assert(s1 === Map(1L -> 616666666666L, 2L -> 191666666666L,
      3L -> 191666666666L))
    val s2 = scores(star, 2)
    assert(s2 === Map(1L -> 375833333332L, 2L -> 312083333333L,
      3L -> 312083333333L))
  }

  test("sink-only node receives teleport + inflow but contributes nothing") {
    // 1 → 2 only: node 2 is dangling — its mass is dropped (the
    // documented PageRank-lite convention), node 1 gets teleport only
    val s = scores(Seq(1L -> 2L), 1)
    val tele = 15L * 1000000000000L / 200L
    assert(s(1L) === tele)
    assert(s(2L) === tele + 500000000000L * 85L / 100L)
  }

  test("parameter validation fails loud") {
    val df = Seq(1L -> 2L).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(df, "src", "dst", 0))
    intercept[IllegalArgumentException](
      Graph.pageRank(df, "src", "dst", 1, dampingE2 = 101L))
  }
}
