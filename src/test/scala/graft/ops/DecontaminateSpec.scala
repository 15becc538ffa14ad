package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 200L).map(i => (i, s"doc body number ${i % 50}"))
    .toDF("id", "text") // ids 0..199 over 50 distinct texts (4 copies each)

  private def contam = Seq("doc body number 7", "doc body number 13",
    "doc body number 49", "not in the corpus at all")
    .toDF("bad_text")

  test("bloom antiJoin equals the plain exact anti join") {
    val got = Decontaminate.antiJoin(corpus, col("text"), contam, col("bad_text"))
      .select("id").as[Long].collect().toSet
    val want = corpus.join(contam, col("text") === col("bad_text"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(got == want)
    assert(got.size == 200 - 3 * 4) // 3 contaminated texts × 4 copies
  }

  test("bloom antiJoin stays exact when the bloom is saturated with false positives") {
    // fpp=0.4 on 4 keys → the sketch is tiny and lies constantly; the
    // phase-2 verify must clear every false positive
    val got = Decontaminate.antiJoin(corpus, col("text"), contam, col("bad_text"),
        fpp = 0.4)
      .select("id").as[Long].collect().toSet
    val want = corpus.join(contam, col("text") === col("bad_text"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(got == want)
  }

  test("flag marks exactly the contaminated rows and keeps every row") {
    val out = Decontaminate.flag(corpus, col("text"), contam, col("bad_text"))
      .select("id", "contaminated").as[(Long, Boolean)].collect()
    assert(out.length == 200)
    val flagged = out.filter(_._2).map(_._1).toSet
    val want = corpus.join(contam, col("text") === col("bad_text"), "left_semi")
      .select("id").as[Long].collect().toSet
    assert(flagged == want)
  }

  test("null corpus keys survive antiJoin and are flagged clean") {
    // SQL null semantics: a NULL key never equals a contamination key,
    // so a plain left_anti KEEPS null-key rows — the bloom two-phase
    // form must match that exactly (no silent loss on nullable keys)
    val withNulls = corpus.select(col("id"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("text")).as("text"))
    val got = Decontaminate.antiJoin(withNulls, col("text"), contam, col("bad_text"))
      .select("id").as[Long].collect().toSet
    val want = withNulls.join(contam, col("text") === col("bad_text"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(got == want)
    assert((0L until 200L by 10L).toSet.subsetOf(got), "null-key rows must be kept")
    val flagged = Decontaminate.flag(withNulls, col("text"), contam, col("bad_text"))
      .select("id", "contaminated").as[(Long, Boolean)].collect()
    assert(flagged.length == 200, "flag keeps every row, including null keys")
    assert(flagged.filter(r => r._1 % 10 == 0).forall(!_._2))
  }

  test("the probe is the native codegen'd bloom expression, not a UDF") {
    // the physical plan collapses over a LocalRelation fixture
    // (ConvertToLocalRelation folds the filter at optimization time —
    // itself evidence the probe is a pure Catalyst expression); the
    // analyzed plan keeps the expression visible. The parquet-backed
    // physical-plan assertion lives in PlanPropertiesSpec (q85).
    val qe = Decontaminate.antiJoin(corpus, col("text"), contam, col("bad_text"))
      .queryExecution
    assert(qe.analyzed.toString.contains("might_contain"),
      qe.analyzed.toString.take(600))
    val p = qe.executedPlan.toString
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("UDF"), p.take(600))
  }

  test("ngramOverlapFraction counts distinct-gram hits exactly") {
    // doc 1 "a b c a b": distinct 2-grams {a b, b c, c a} (dup "a b"
    // collapses); bench grams {b c, c d} → 1 hit of 3 → frac 3333
    val docs = Seq((1L, "a b c a b"), (2L, "x y"), (3L, "z"))
      .toDF("doc_id", "text")
    val bench = Seq((9L, "b c d")).toDF("doc_id", "text")
    val byId = Decontaminate.ngramOverlapFraction(docs, bench, "doc_id", "text", n = 2)
      .select("doc_id", "n_grams", "hits", "frac_e4")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(byId(1L) == (3L, 1L, 3333L))
    assert(byId(2L) == (1L, 0L, 0L)) // {x y}, no overlap → zero, not dropped
    assert(!byId.contains(3L), "single-token doc has no 2-grams → excluded")
  }

  test("ngramOverlapFraction: full containment scores 10000, gram strings never shuffle") {
    val docs = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val bench = Seq((9L, "also the quick brown fox jumps again")).toDF("doc_id", "text")
    val df = Decontaminate.ngramOverlapFraction(docs, bench, "doc_id", "text", n = 3)
    val row = df.select("n_grams", "hits", "frac_e4").as[(Long, Long, Long)].head()
    assert(row == (3L, 3L, 10000L))
    // the family invariant: only 8-byte gram hashes enter any exchange
    val p = df.queryExecution.executedPlan.toString
    val bad = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .filter(l => l.contains("text#") || l.contains("g#"))
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("multiPatternHits counts every occurrence, overlapping and nested") {
    val docs = Seq(
      (1L, "batch batch batch data scan"), // "batch batch" ×2 overlapping
      (2L, "no hits here"),
      (3L, "scan order data data")         // "an or" crosses the word gap
    ).toDF("doc_id", "text")
    val pats = Seq("batch batch", "data", "an or", "absent")
    val got = Decontaminate.multiPatternHits(docs, "doc_id", "text", pats)
      .select("doc_id", "pattern", "n_hits").as[(Long, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      (1L, "batch batch") -> 2L, (1L, "data") -> 1L,
      (3L, "data") -> 2L, (3L, "an or") -> 1L))
  }

  test("multiPatternHits agrees with a per-pattern naive scan on corpus text") {
    def naive(t: String, p: String): Long =
      (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)).toLong
    val docs = corpus
    val pats = Seq("doc body", "body number 1", "number", "umber 4", "zz")
    val got = Decontaminate.multiPatternHits(docs, "id", "text", pats)
      .select("doc_id", "pattern", "n_hits").as[(Long, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val want = (for {
      (id, t) <- docs.as[(Long, String)].collect()
      p <- pats
      n = naive(t, p) if n > 0L
    } yield (id, p) -> n).toMap
    assert(got == want)
  }

  test("multiPatternFilter drops exactly the documents with any hit") {
    val kept = Decontaminate.multiPatternFilter(corpus, "text",
        Seq("number 7", "number 13"))
      .select("id").as[Long].collect().toSet
    val want = corpus.as[(Long, String)].collect()
      .filter(r => !r._2.contains("number 7") && !r._2.contains("number 13"))
      .map(_._1).toSet
    assert(kept == want)
  }

  test("multiPatternScrub removes covered spans and counts removed chars") {
    val docs = Seq(
      (1L, "keep batch batch batch keep"), // the whole 17-char run is covered
      (2L, "untouched text"),
      (3L, "data data")
    ).toDF("doc_id", "text")
    val got = Decontaminate.multiPatternScrub(docs, "doc_id", "text",
        Seq("batch batch", "data"))
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (("keep  keep", 17L)))
    assert(got(2L) == (("untouched text", 0L)))
    assert(got(3L) == ((" ", 8L)))
  }

  test("multiPatternHits plan is a pure map: no exchange at all") {
    val df = Decontaminate.multiPatternHits(corpus, "id", "text", Seq("number"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
