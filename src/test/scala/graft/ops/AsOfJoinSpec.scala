package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes per symbol; trades look up the latest quote at-or-before
  private def quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)
  ).toDF("sym", "qts", "px")

  private def trades = Seq(
    ("A", 5L, 100L),   // before any quote -> null
    ("A", 20L, 101L),  // equal ts -> inclusive match (2.0)
    ("A", 25L, 102L),  // between -> 2.0
    ("A", 99L, 103L),  // after all -> 3.0
    ("B", 16L, 104L),  // other key isolated -> 9.0
    ("C", 50L, 105L)   // key with no right rows -> null
  ).toDF("sym", "tts", "trade_id")

  test("as-of join: latest right row at-or-before, per key, left-outer") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(
      100L -> None, 101L -> Some(2.0), 102L -> Some(2.0),
      103L -> Some(3.0), 104L -> Some(9.0), 105L -> None))
  }

  test("right-side ties at the same ts resolve to the greatest payload tuple") {
    val q = Seq(("A", 10L, 1.0), ("A", 10L, 5.0)).toDF("sym", "qts", "px")
    val t = Seq(("A", 11L, 1L)).toDF("sym", "tts", "trade_id")
    val out = AsOfJoin.asOf(t, q, Seq("sym"), "tts", "qts", Seq("px"))
      .select("px").as[Double].head()
    assert(out == 5.0)
  }

  test("multi-column payload travels as one row even with null fields") {
    // the newer quote has px=NULL: a per-column carry would mix the new
    // null-px row's size with the OLD row's px — the struct carry must
    // return (null, 7.0), both from the newest row
    val q = Seq(("A", 10L, Some(2.0), 3.0), ("A", 20L, None, 7.0))
      .toDF("sym", "qts", "px", "qty")
    val t = Seq(("A", 25L, 1L)).toDF("sym", "tts", "trade_id")
    val out = AsOfJoin.asOf(t, q, Seq("sym"), "tts", "qts", Seq("px", "qty"))
      .select("px", "qty").as[(Option[Double], Double)].head()
    assert(out == ((None, 7.0)), s"got $out")
  }

  test("matches the naive join+rank formulation on a dense fixture") {
    val q = (1L to 200L).map(i => ("K" + (i % 5), i, i.toDouble))
      .toDF("sym", "qts", "px")
    val t = (1L to 100L).map(i => ("K" + (i % 7), i * 2, i))
      .toDF("sym", "tts", "trade_id")
    val fast = AsOfJoin.asOf(t, q, Seq("sym"), "tts", "qts", Seq("px"))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    val naive = t.join(q, t("sym") === q("sym") && q("qts") <= t("tts"), "left")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(t("sym"), $"tts", $"trade_id")
          .orderBy($"qts".desc)))
      .filter($"rn" === 1)
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(fast == naive)
  }
}
