package graft.ops

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges replays the textbook greedy loop on a hand-computed corpus") {
    // word freqs: "low" ×5, "lower" ×2, "newest" ×6, "widest" ×3
    // (the Sennrich et al. running example). Pair counts round 1:
    // (e,s) 6+3=9, (s,t) 9, (w,e) 2+6=8, (l,o) 7, (o,w) 7, ...
    // top = (e,s) by the lexicographic tiebreak against (s,t).
    val docs = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = docs.map(w => s"$w").toDF("text")
    val out = BpeTrain.learnMerges(df, "text", nMerges = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L)), out.toString)
  }

  test("merge is leftmost non-overlapping: aaaa under (a,a) yields aa aa, not a cascade") {
    // one word "aaaa" ×3: round 1 pair (a,a) ct=9 (3 adjacencies × 3),
    // merged leftmost-first -> "aa aa". Round 2: (aa,aa) ct=3.
    val df = Seq.fill(3)("aaaa").toDF("text")
    val out = BpeTrain.learnMerges(df, "text", nMerges = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1, "a", "a", "aa", 9L),
      (2, "aa", "aa", "aaaa", 3L)), out.toString)
  }

  test("merges never fire inside a multi-char symbol (r11 review counterexample)") {
    // 'xa'x10, 'ab'x6, 'xab'x3. Round 1: (x,a) ct 13 beats (a,b) ct 9.
    // After it, 'xab' = [xa, b]. Round 2 merges (a,b) ct 6 — a
    // boundary-blind replace would corrupt [xa, b] into [xab] here
    // (matching the 'a' INSIDE symbol 'xa') and kill round 3's merge.
    // Textbook BPE leaves [xa, b] intact and learns (xa, b) ct 3 third.
    val docs = Seq.fill(10)("xa") ++ Seq.fill(6)("ab") ++ Seq.fill(3)("xab")
    val out = BpeTrain.learnMerges(docs.toDF("text"), "text", nMerges = 4)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1, "x", "a", "xa", 13L),
      (2, "a", "b", "ab", 6L),
      (3, "xa", "b", "xab", 3L)), out.toString)
  }

  test("stops early when no pair reaches minCount") {
    val df = Seq("ab").toDF("text") // single (a,b) adjacency, ct = 1 < 2
    assert(BpeTrain.learnMerges(df, "text", nMerges = 5).count() == 0)
    // and single-char words produce no pairs at all
    assert(BpeTrain.learnMerges(Seq("a b c").toDF("text"), "text", 5).count() == 0)
  }

  // ---- encode side ----

  private val sennrichMerges = Seq("e" -> "s", "es" -> "t", "l" -> "o")

  test("encodeWords applies merges in rank order: lowest -> [lo, w, est]") {
    val got = BpeTrain.encodeWords(
      Seq("lowest low newest").toDF("text"), "text", sennrichMerges)
      .as[(String, Seq[String], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("lowest") == ((Seq("lo", "w", "est"), 3L)), got.toString)
    assert(got("low") == ((Seq("lo", "w"), 2L)))
    assert(got("newest") == ((Seq("n", "e", "w", "est"), 4L)))
  }

  test("rank order equals priority order: later merges cannot re-enable earlier ones") {
    // merges rank 1 (b,c), rank 2 (a,b): the priority encode of "abc"
    // applies (b,c) first -> [a, bc]; (a,b) then has no bare pair left.
    // The sequential replace chain must agree, not produce [ab, c].
    val got = BpeTrain.encodeWords(
      Seq("abc").toDF("text"), "text", Seq("b" -> "c", "a" -> "b"))
      .as[(String, Seq[String], Long)].collect().head
    assert(got._2 == Seq("a", "bc"), got.toString)
  }

  test("encode round-trips: concatenated tokens rebuild every word") {
    val corpus = Seq("the quick brown fox lowest slowest widest",
      "low lower newest estates")
    val merges = Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w",
      "t" -> "h", "w" -> "e")
    val got = BpeTrain.encodeWords(corpus.toDF("text"), "text", merges)
      .as[(String, Seq[String], Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (w, toks, n) =>
      assert(toks.mkString("") == w, s"$w -> $toks")
      assert(n == toks.length)
    }
  }

  test("tokenCounts: per-doc budget under the trained tokenizer, zero-spined") {
    // doc 1: low ×2 (2 toks each) + lower (l o w e r -> lo w e r = 4)
    // doc 2: newest (n e w est = 4); doc 3: no countable words
    val docs = Seq((1L, "low lower LOW"), (2L, "newest"), (3L, " "))
      .toDF("doc_id", "text")
    val got = BpeTrain.tokenCounts(docs, "doc_id", "text", sennrichMerges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((8L, 3L)), got.toString)
    assert(got(2L) == ((4L, 1L)))
    assert(got(3L) == ((0L, 0L)))
  }

  test("batched merges (mergeBatch=8) equal the sequential merge list on real text") {
    // the fixture documents table: natural-language word/pair Zipf —
    // exactly the distribution where independent high-count pairs
    // coexist and batching actually accepts prefixes > 1. The
    // acceptance rule (trio-disjoint prefix + strict boundary) is
    // PROVABLY equivalent, so the lists must match element for
    // element, counts included — any divergence is an acceptance bug.
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"text")
    val seq1 = BpeTrain.learnMerges(docs, "text", nMerges = 40)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val seq8 = BpeTrain.learnMerges(docs, "text", nMerges = 40, mergeBatch = 8)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(seq8 === seq1)
  }

  test("batched merges honor the strict boundary on an adversarial tie") {
    // 'ab'x5, 'cd'x5: (a,b) and (c,d) both ct=5, disjoint — ties
    // INSIDE the prefix are fine, so mergeBatch=2 takes both in one
    // round and the list equals sequential's lexical tie order
    val df = (Seq.fill(5)("ab") ++ Seq.fill(5)("cd")).toDF("text")
    val s1 = BpeTrain.learnMerges(df, "text", 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val s2 = BpeTrain.learnMerges(df, "text", 2, mergeBatch = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(s1 === s2)
    assert(s1.map(m => (m._2, m._3)) === Seq(("a", "b"), ("c", "d")))
  }

  test("batched merges reject dependent candidates: shared-symbol pair waits a round") {
    // 'ab'x6, 'bc'x4: (a,b) ct 6 then (b,c) shares 'b' — a batch must
    // NOT take both (after (a,b), 'b' occurrences changed); sequential
    // recounts and still merges (b,c) ct 4 next ONLY because 'ab' and
    // 'bc' never co-occur in a word here, so the counts agree — the
    // point is the batched path must reach the same list via the
    // one-accept round, not by batching the dependent pair
    val df = (Seq.fill(6)("ab") ++ Seq.fill(4)("bc")).toDF("text")
    val s1 = BpeTrain.learnMerges(df, "text", 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val s8 = BpeTrain.learnMerges(df, "text", 2, mergeBatch = 8)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(s8 === s1)
    assert(s1.map(m => (m._2, m._3)) === Seq(("a", "b"), ("b", "c")))
  }
}
