package graft.ops

import graft.SparkSpec

class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 60L).map { id =>
    (id, if (id <= 30) "web" else if (id <= 45) "wiki" else "code")
  }.toDF("id", "src")

  test("sources appear at their configured rates throughout the order") {
    val keyed = Sampling.interleaveBySource(docs, "id", "src", "id",
      Map("web" -> 2000000L, "wiki" -> 1000000L), defaultWeightE6 = 1000000L)
    val order = keyed.orderBy("interleave_key", "src", "within_rank")
      .select("src").as[String].collect().toSeq
    // first 12 scheduled slots: web fires twice per wiki/code firing
    val head = order.take(12)
    assert(head.count(_ == "web") >= 6, head.toString)
    // no pocket: every window of 12 consecutive docs has all 3 sources
    // until a source is exhausted (wiki+code run out after rank 15 ==
    // virtual time 15e9, i.e. 30 web + 15 wiki + 15 code = 60 docs)
    order.sliding(12).take(20).foreach { wnd =>
      assert(wnd.toSet == Set("web", "wiki", "code"), wnd.toString)
    }
  }

  test("the key is a pure integer function of rank and weight — replayable") {
    val keyed = Sampling.interleaveBySource(docs, "id", "src", "id",
      Map("web" -> 3000000L))
    val got = keyed.filter($"src" === "web").orderBy("within_rank")
      .select("within_rank", "interleave_key").as[(Long, Long)].collect()
    got.foreach { case (r, k) => assert(k == r * 1000000000L / 3000000L) }
  }

  test("one shuffle (the per-source rank window); no global window") {
    val plan = Sampling.interleaveBySource(docs, "id", "src", "id",
      Map("web" -> 2000000L)).queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    val singleParts = plan.linesIterator.count(_.contains("Exchange SinglePartition"))
    assert(exchanges == 1 && singleParts == 0, plan.take(1200))
  }
}
