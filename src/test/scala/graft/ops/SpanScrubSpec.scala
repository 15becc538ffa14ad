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

  test("dedupParagraphs: corpus-first wins, within-doc repeats go, round-trip") {
    val nn = "\n\n"
    val docs = Seq(
      (1L, s"HEADER${nn}unique one${nn}repeat me${nn}repeat me"),
      (2L, s"HEADER${nn}unique two${nn}repeat me"),
      (3L, s"all original${nn}nothing shared here")
    ).toDF("doc_id", "text")
    val out = SpanScrub.dedupParagraphs(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1 is corpus-first for HEADER and "repeat me"; its second
    // "repeat me" (within-doc dup) is killed
    assert(out(1L) == ((s"HEADER${nn}unique one${nn}repeat me", 1L)), out(1L))
    // doc 2 loses both shared paragraphs to doc 1
    assert(out(2L) == (("unique two", 2L)), out(2L))
    // untouched doc round-trips byte-identical
    assert(out(3L) == ((s"all original${nn}nothing shared here", 0L)))
  }

  test("dedupParagraphs: minLen keeps short paragraphs, empty slots survive") {
    val nn = "\n\n"
    val docs = Seq(
      (1L, s"Yes.${nn}${nn}long paragraph body"),
      (2L, s"Yes.${nn}${nn}different body entirely")
    ).toDF("doc_id", "text")
    // minLen 8: "Yes." (5 chars) and the empty slot never participate
    val out = SpanScrub.dedupParagraphs(docs, "doc_id", "text", minLen = 8)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._2 == 0L && out(2L)._2 == 0L)
    assert(out(1L)._1 == s"Yes.${nn}${nn}long paragraph body")
    // at minLen 1 the duplicate "Yes." dedups by keep-first, but the
    // EMPTY slot (length 0 < minLen) still never participates — doc 2
    // keeps its structural empty paragraph
    val strict = SpanScrub.dedupParagraphs(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(strict(1L)._1 == s"Yes.${nn}${nn}long paragraph body")
    assert(strict(2L) == ((s"${nn}different body entirely", 1L)), strict(2L))
    // determinism under repartition
    val again = SpanScrub.dedupParagraphs(docs.repartition(5), "doc_id", "text")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again == strict)
  }

  private def runBoiler(docs: Seq[(Long, String, String)],
                        minFracE6: Long = 600000L, minAbs: Long = 2L,
                        minLen: Int = 3): Map[Long, (String, Long)] =
    SpanScrub.scrubBoilerplateLines(
        docs.toDF("doc_id", "dom", "text"), "doc_id", "dom", "text",
        minFracE6 = minFracE6, minAbs = minAbs, minLen = minLen)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("scrubBoilerplateLines: frequencies never pool across domains") {
    // "Subscribe now" is on EVERY page of domain a (hot, removed) but
    // on only 1 of 3 pages of domain b (cold there, KEPT) — the q160
    // d0-d4 vs d5-d9 contract in miniature
    val docs = Seq(
      (1L, "a", "Subscribe now\nbody one"),
      (2L, "a", "Subscribe now\nbody two"),
      (3L, "a", "Subscribe now\nbody three"),
      (4L, "b", "Subscribe now\nother body"),
      (5L, "b", "fresh content\nmore text"),
      (6L, "b", "unrelated page\nlast text"))
    val out = runBoiler(docs)
    assert(out(1L) == (("body one", 1L)), out(1L))
    assert(out(2L) == (("body two", 1L)))
    // domain b: df("Subscribe now") = 1 < ceil(3*0.6) = 2 → kept
    assert(out(4L) == (("Subscribe now\nother body", 0L)), out(4L))
    assert(out(5L) == (("fresh content\nmore text", 0L)))
  }

  test("scrubBoilerplateLines: minLen exempts short lines even at 100% df") {
    // "ad" (2 chars < minLen=3) is on every page but never
    // participates; the 3-char "nav" IS removed
    val docs = Seq(
      (1L, "a", "nav\nad\nunique body 1"),
      (2L, "a", "nav\nad\nunique body 2"),
      (3L, "a", "nav\nad\nunique body 3"))
    val out = runBoiler(docs)
    assert(out(1L) == (("ad\nunique body 1", 1L)), out(1L))
    // raising minLen past "nav" keeps everything
    val lax = runBoiler(docs, minLen = 4)
    assert(lax(1L) == (("nav\nad\nunique body 1", 0L)))
  }

  test("scrubBoilerplateLines: minAbs keeps singleton domains inert; every copy goes") {
    val docs = Seq(
      // singleton domain: ceil(1*0.6)=1 but minAbs=2 → nothing hot
      (1L, "solo", "only page\nof this domain"),
      // hot line repeated WITHIN a page: df counts distinct docs (2 of
      // 2 ≥ 2), and removal kills ALL positions including the repeat
      (2L, "c", "footer line\nbody two\nfooter line"),
      (3L, "c", "footer line\nbody three"))
    val out = runBoiler(docs)
    assert(out(1L) == (("only page\nof this domain", 0L)))
    assert(out(2L) == (("body two", 2L)), out(2L))
    assert(out(3L) == (("body three", 1L)))
    // determinism under repartition
    val again = SpanScrub.scrubBoilerplateLines(
        docs.toDF("doc_id", "dom", "text").repartition(5),
        "doc_id", "dom", "text", minFracE6 = 600000L, minAbs = 2L, minLen = 3)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again == out)
  }
}
