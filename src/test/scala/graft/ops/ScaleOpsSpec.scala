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
