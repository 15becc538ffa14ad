package graft.ops

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed and drops unchanged") {
    val oldSnap = Seq(
      (1L, "alpha text"), (2L, "beta text"), (3L, "gamma text"))
      .toDF("id", "text")
    val newSnap = Seq(
      (2L, "beta text"),            // unchanged → absent from output
      (3L, "gamma text revised"),   // changed
      (4L, "delta text"))           // added; id 1 removed
      .toDF("id", "text")
    val got = Snapshot.diff(oldSnap, newSnap, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"), got)
  }

  test("diff is whitespace/case-insensitive like the content fingerprint") {
    val oldSnap = Seq((1L, "Same   Doc")).toDF("id", "text")
    val newSnap = Seq((1L, "same doc")).toDF("id", "text")
    assert(Snapshot.diff(oldSnap, newSnap, "id", "text").count() == 0)
  }
}
