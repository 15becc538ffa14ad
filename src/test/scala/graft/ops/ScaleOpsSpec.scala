package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation (incl. a hot key)") {
    // key "hot" has 100× the rows of the others
    val rows = (1L to 1000L).map(i => ("hot", i.toDouble)) ++
      (1L to 10L).map(i => ("cold1", i.toDouble)) ++
      (1L to 10L).map(i => ("cold2", i * 2.0))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", salts = 8)
      .orderBy("k").as[(String, Double, Long)].collect().toSeq
    val direct = df.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("row_ct"))
      .orderBy("k").as[(String, Double, Long)].collect().toSeq
    assert(salted == direct)
  }

  test("headTailJoin equals the plain join and broadcasts the head") {
    // Zipf-ish: token t1 in 500 rows, t2 in 50, the rest rare
    val probe = ((1L to 500L).map(i => (i, "t1")) ++
      (1L to 50L).map(i => (i, "t2")) ++
      (1L to 5L).map(i => (i, s"rare$i"))).toDF("id", "tok")
    val stats = probe.groupBy($"tok").agg(count(lit(1)).as("freq"))
    val got = Skew.headTailJoin(probe, stats, "tok", $"freq", topK = 2)
    val want = probe.join(stats, "tok")
    assert(got.count() == want.count())
    assert(got.select("tok", "id", "freq").as[(String, Long, Long)].collect().toSet ==
      want.select("tok", "id", "freq").as[(String, Long, Long)].collect().toSet)
    // the head leg is a broadcast join; the raw hot key never drives a
    // shuffled join alone
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(500))
  }

  test("headTailJoin keeps every row of a duplicate-key right side (r10)") {
    // right carries TWO rows per key; topK = 2 lands the limit cut
    // inside a key for the old row-level selection
    val probe = ((1L to 100L).map(i => (i, "t1")) ++
      (1L to 60L).map(i => (i, "t2")) ++
      (1L to 5L).map(i => (i, "t3"))).toDF("id", "tok")
    val stats0 = probe.groupBy($"tok").agg(count(lit(1)).as("freq"))
    val right = stats0.unionByName(stats0.withColumn("freq", $"freq" + 1))
    val got = Skew.headTailJoin(probe, right, "tok", $"freq", topK = 2)
    val want = probe.join(right, "tok")
    assert(got.count() == want.count(), "duplicate-key rows must not drop")
    // and the unique-keys fast path equals the general path on unique input
    val fast = Skew.headTailJoin(probe, stats0, "tok", $"freq", topK = 2,
      uniqueKeys = true)
    val general = Skew.headTailJoin(probe, stats0, "tok", $"freq", topK = 2)
    assert(fast.select("tok", "id", "freq").as[(String, Long, Long)].collect().toSet ==
      general.select("tok", "id", "freq").as[(String, Long, Long)].collect().toSet)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh != null)
    val left = (1L to 1000L).map(i => (i, s"L$i")).toDF("id", "lv")
    val right = (1L to 1000L).map(i => (i, i * 2.0)).toDF("id", "rv")
    Bucketing.writeBucketed(left, "bk_left", Seq("id"), 4, sortCols = Seq("id"))
    Bucketing.writeBucketed(right, "bk_right", Seq("id"), 4, sortCols = Seq("id"))
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bk_left").join(spark.table("bk_right"), "id")
        assert(joined.count() == 1000L)
        assert(Bucketing.isExchangeFree(joined),
          s"bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
        // contrast: the same join on unbucketed data DOES shuffle
        val plain = left.join(right, "id")
        assert(!Bucketing.isExchangeFree(plain),
          "unbucketed large-large join is expected to exchange")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      Bucketing.dropTable(spark, "bk_left")
      Bucketing.dropTable(spark, "bk_right")
    }
  }
}
