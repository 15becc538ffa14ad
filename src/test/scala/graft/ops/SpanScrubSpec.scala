package graft.ops

import graft.SparkSpec

class SpanScrubSpec extends SparkSpec {
  import spark.implicits._

  /** Scala reference implementation: same contract, brute force. */
  private def reference(docs: Map[Long, String], k: Int, stride: Int,
                        maxDf: Long): Map[Long, String] = {
    val wins = docs.toSeq.flatMap { case (id, t) =>
      if (t.length < k) Seq.empty
      else (0 to t.length - k by stride).map(o => (id, o, t.substring(o, o + k)))
    }
    val wdf = wins.map(w => (w._1, w._3)).distinct
      .groupBy(_._2).view.mapValues(_.size).toMap
    docs.map { case (id, t) =>
      val offs = wins.filter(w => w._1 == id && wdf(w._3) > maxDf)
        .map(_._2).distinct.sorted
      var cur = 0
      val sb = new StringBuilder
      offs.foreach { o =>
        if (o > cur) sb.append(t.substring(cur, o))
        cur = math.max(cur, o + k)
      }
      if (t.length > cur) sb.append(t.substring(cur))
      id -> sb.toString
    }
  }

  private def run(docs: Map[Long, String], k: Int, stride: Int, maxDf: Long) = {
    val df = docs.toSeq.toDF("doc_id", "text")
    val got = SpanScrub.scrubRepeatedSpans(df, "doc_id", "text", k, stride, maxDf)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    val want = reference(docs, k, stride, maxDf)
    assert(got == want, s"\ngot  $got\nwant $want")
    got
  }

  test("boilerplate shared by many docs is cut; unique text survives") {
    // bodies share NO k-char substring (distinct letter runs), so only
    // the 22-char boiler windows (offsets 0..12, all hot) are cut —
    // the cursor lands exactly at 22 and each body survives whole
    val boiler = "COPYRIGHT HEADER TEXT."
    val docs = (1L to 5L).map(i =>
      i -> (boiler + ('a' + i).toChar.toString * 20)).toMap +
      (9L -> "a completely unrelated document body")
    val out = run(docs, k = 10, stride = 2, maxDf = 3)
    assert(out(1L) == "b" * 20, s"got '${out(1L)}'")
    assert(out(9L) == docs(9L), "doc with no hot span passes through untouched")
  }

  test("overlapping hot spans merge through the cursor walk") {
    // every stride-2 window of the shared region is hot (including the
    // ones reaching into the shared ' tail' prefix) → the overlapping
    // [o, o+k) spans merge into one contiguous cut through offset 26,
    // leaving chars 34.. = the per-doc digit suffix
    val shared = "x" * 30
    val docs = (1L to 4L).map(i => i -> s"$shared tail$i").toMap
    val out = run(docs, k = 8, stride = 2, maxDf = 2)
    assert(out(1L) == "l1", s"got '${out(1L)}'")
  }

  test("docs shorter than k, empty docs, and a hot span at the very end") {
    val docs = Map(
      1L -> "short",
      2L -> "",
      3L -> "prefix3 THE-SHARED-TAIL-BLOCK",
      4L -> "prefix4 THE-SHARED-TAIL-BLOCK",
      5L -> "prefix5 THE-SHARED-TAIL-BLOCK")
    val out = run(docs, k = 12, stride = 3, maxDf = 2)
    assert(out(1L) == "short" && out(2L) == "")
    assert(out(3L).startsWith("prefix3") && !out(3L).contains("SHARED"))
  }

  test("removed_chars accounts exactly for the cut") {
    val docs = (1L to 4L).map(i => i -> s"AAAAAAAAAAAAAAAAAAAA body$i").toMap
    val df = docs.toSeq.toDF("doc_id", "text")
    val rows = SpanScrub.scrubRepeatedSpans(df, "doc_id", "text", 10, 2, 3)
      .select("doc_id", "clean_text", "removed_chars")
      .as[(Long, String, Long)].collect()
    rows.foreach { case (id, clean, removed) =>
      assert(removed == docs(id).length - clean.length)
    }
  }
}
