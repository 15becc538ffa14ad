package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("exactDistinct counts distinct longs per group with map-side merge") {
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L), ("b", 5L), ("b", 5L)
    ).toDF("k", "v").repartition(4) // force multi-partition merge path
    val out = df.groupBy($"k")
      .agg(Aggregators.exactDistinct($"v").as("d"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
    // agrees with countDistinct on the same data
    val builtin = df.groupBy($"k").agg(countDistinct($"v").as("d"))
      .as[(String, Long)].collect().toMap
    assert(out == builtin)
  }

  test("q48's HLL sketch stays within its rsd bound of exact daily UV") {
    // the rows-only query's accuracy floor, pinned the same way the ANN
    // family pins recall: deterministic data + implementation make the
    // approx values stable, so a params/algorithm regression fails here
    // instead of silently shipping bad counts. 2% rsd → assert 3σ.
    val sf = "/root/testdata/sf0.001"
    val approx = graft.SparkEntry.queries("q48_uv_approx")(spark, sf)
      .as[(String, Long)].collect().toMap
    val exact = graft.core.Tables.load(spark, sf, "events")
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("dt"))
      .agg(countDistinct($"user_id").as("uv"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    for ((dt, ex) <- exact) {
      val ap = approx(dt).toDouble
      assert(math.abs(ap - ex) <= math.max(0.06 * ex, 3.0),
        s"$dt: approx $ap vs exact $ex exceeds 3×rsd")
    }
  }

  test("SQL registration: graft functions callable from spark.sql") {
    SqlFunctions.registerAll(spark)
    Seq(("the cat and the dog of it", 7L), ("der hund und die katze", 5L))
      .toDF("text", "n").createOrReplaceTempView("sqlfn_docs")
    val rows = spark.sql(
      """SELECT graft_lang_id(text) AS lang, graft_token_count(text) AS tc,
         graft_exact_distinct(n) AS d
         FROM sqlfn_docs GROUP BY 1, 2""")
      .as[(String, Int, Long)].collect().toSet
    assert(rows == Set(("en", 7, 1L), ("de", 5, 1L)))
  }
}
