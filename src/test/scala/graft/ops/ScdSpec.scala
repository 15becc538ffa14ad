package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val changelog = Seq(
    // key 1: A, A (collapse), B, A — three runs
    (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
    (1L, ts("2024-01-02 00:00:00"), 2L, "A"),
    (1L, ts("2024-01-03 00:00:00"), 3L, "B"),
    (1L, ts("2024-01-04 00:00:00"), 4L, "A"),
    // key 2: single version
    (2L, ts("2024-01-02 12:00:00"), 5L, "C")
  ).toDF("k", "ts", "seq", "attr")

  test("consecutive duplicate versions collapse; intervals are half-open and gap-free") {
    val h = Scd.buildHistory(changelog, "k", "ts", "seq", Seq("attr"))
      .orderBy("k", "effective_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(h == Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, "B", ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), false),
      (1L, "A", ts("2024-01-04 00:00:00"), None, true),
      (2L, "C", ts("2024-01-02 12:00:00"), None, true)), h.toString)
  }

  test("same-timestamp updates order by the tie column; later seq wins the interval") {
    val t0 = ts("2024-01-01 00:00:00")
    val df = Seq((1L, t0, 2L, "Y"), (1L, t0, 1L, "X"))
      .toDF("k", "ts", "seq", "attr")
    val h = Scd.buildHistory(df, "k", "ts", "seq", Seq("attr"))
      .orderBy("effective_from", "attr")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    // X (seq 1) then Y (seq 2): X's interval is zero-length, Y is current
    assert(h == Seq(
      (1L, "X", t0, Some(t0), false),
      (1L, "Y", t0, None, true)), h.toString)
  }

  test("snapshotAt returns exactly the covering version per key") {
    val h = Scd.buildHistory(changelog, "k", "ts", "seq", Seq("attr"))
    val got = Scd.snapshotAt(h, lit(ts("2024-01-03 06:00:00")))
      .select("k", "attr").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "B", 2L -> "C"), got.toString)
    // before key 2 existed: only key 1's first version covers
    val early = Scd.snapshotAt(h, lit(ts("2024-01-01 12:00:00")))
      .select("k", "attr").as[(Long, String)].collect().toMap
    assert(early == Map(1L -> "A"), early.toString)
  }

  test("applyChangelog == rebuild: boundary collapse, reopened rows, new keys") {
    val c1 = changelog // keys 1 (A,A,B,A runs) and 2 (C), all <= Jan 4
    val c2 = Seq(
      (1L, ts("2024-01-05 00:00:00"), 6L, "A"), // == current attr: collapses
      (1L, ts("2024-01-06 00:00:00"), 7L, "B"), // real new version
      (2L, ts("2024-01-05 00:00:00"), 8L, "D"), // closes key 2's only row
      (3L, ts("2024-01-05 00:00:00"), 9L, "E")  // brand-new key
    ).toDF("k", "ts", "seq", "attr")
    val incremental = Scd.applyChangelog(
      Scd.buildHistory(c1, "k", "ts", "seq", Seq("attr")),
      c2, "k", "ts", "seq", Seq("attr"))
    val rebuild = Scd.buildHistory(c1.unionByName(c2), "k", "ts", "seq", Seq("attr"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSet
    assert(rows(incremental) == rows(rebuild), rows(incremental).toString)
    // the collapsed boundary kept the ORIGINAL effective_from open row
    val key1Current = rows(incremental).filter(r => r._1 == 1L && r._5)
    assert(key1Current.map(r => (r._2, r._3)) ==
      Set(("B", ts("2024-01-06 00:00:00"))), key1Current.toString)
    assert(rows(incremental).exists(r =>
      r._1 == 1L && r._2 == "A" && r._3 == ts("2024-01-04 00:00:00") &&
        r._4.contains(ts("2024-01-06 00:00:00"))),
      "the reopened run must keep its original effective_from")
  }

  test("applyChangelog drops retro-edits (append-only contract), never corrupts") {
    val h = Scd.buildHistory(changelog, "k", "ts", "seq", Seq("attr"))
    val retro = Seq(
      (1L, ts("2024-01-03 12:00:00"), 6L, "Z"), // before key 1's current from (Jan 4)
      (2L, ts("2024-01-06 00:00:00"), 7L, "D")  // valid
    ).toDF("k", "ts", "seq", "attr")
    val (merged, rejects) = Scd.applyChangelogWithRejects(
      h, retro, "k", "ts", "seq", Seq("attr"))
    val got = merged
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toSet
    assert(!got.exists(_._2 == "Z"), s"retro-edit must be dropped: $got")
    assert(got.exists(r => r._1 == 2L && r._2 == "D" && r._5), got.toString)
    // the drop is OBSERVABLE: the retro-edit row comes back on the
    // rejects side output (schema = changelog columns), valid rows don't
    val rej = rejects.as[(Long, Timestamp, Long, String)].collect().toSeq
    assert(rej == Seq((1L, ts("2024-01-03 12:00:00"), 6L, "Z")),
      s"rejects must carry exactly the dropped retro-edit: $rej")
  }

  test("null-ts changelog row for an existing key surfaces in rejects, not in neither") {
    // three-valued logic trap (r13 ADVICE): a NULL ts satisfies neither
    // `ts > cur_from` (merge) nor `ts <= cur_from` (naive reject) — the
    // reject filter must be the guard's exact complement so the drop
    // stays observable
    val h = Scd.buildHistory(changelog, "k", "ts", "seq", Seq("attr"))
    val batch = Seq(
      (1L, null.asInstanceOf[Timestamp], 6L, "Z"), // null ts, existing key
      (2L, ts("2024-01-06 00:00:00"), 7L, "D")     // valid
    ).toDF("k", "ts", "seq", "attr")
    val (merged, rejects) = Scd.applyChangelogWithRejects(
      h, batch, "k", "ts", "seq", Seq("attr"))
    assert(!merged.as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().exists(_._2 == "Z"), "null-ts retro row must not merge")
    val rej = rejects.as[(Long, Option[Timestamp], Long, String)].collect().toSeq
    assert(rej == Seq((1L, None, 6L, "Z")),
      s"null-ts drop must be observable on the rejects side: $rej")
  }

  test("one exchange: run-collapse lag and effective_to lead share sort and shuffle") {
    val plan = Scd.buildHistory(changelog, "k", "ts", "seq", Seq("attr"))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected one shuffle, plan:\n${plan.take(1200)}")
  }
}
