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
