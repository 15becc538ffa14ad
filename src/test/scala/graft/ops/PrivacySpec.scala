package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Release-gate semantics: small cohorts pool into the marker with
  * exact totals; the frequency gate counts DISTINCT documents so
  * within-doc repetition cannot launder a rare key.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("cells under k suppress to the marker; totals and other columns exact") {
    val df = Seq(
      (1L, "en", 0L, 10.0), (2L, "en", 0L, 20.0), (3L, "en", 0L, 30.0),
      (4L, "de", 0L, 5.0), (5L, "de", 1L, 7.0))
      .toDF("id", "lang", "band", "v")
    val out = Privacy.suppressSmallCells(df, Seq("lang", "band"), k = 2L)
      .orderBy("id")
      .as[(Long, String, String, Double)].collect().toSeq
    // (en, 0): 3 rows >= 2 -> kept; (de, 0) and (de, 1): 1 row each ->
    // both quasi columns suppressed, id/v untouched
    assert(out === Seq(
      (1L, "en", "0", 10.0), (2L, "en", "0", 20.0), (3L, "en", "0", 30.0),
      (4L, "*", "*", 5.0), (5L, "*", "*", 7.0)))
    // total row count (and any SUM over v) is exact after suppression
    assert(out.map(_._4).sum === 72.0)
  }

  test("k=1 suppresses nothing; the marker cohort pools multiple tiny cells") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "q")
    assert(Privacy.suppressSmallCells(df, Seq("q"), 1L)
      .filter(col("q") === "*").count() === 0)
    val pooled = Privacy.suppressSmallCells(df, Seq("q"), 2L)
    // three singleton cells all pool into one residual cohort
    assert(pooled.filter(col("q") === "*").count() === 3)
  }

  test("NULL quasi values form a cohort and suppress when under k (fail closed)") {
    val df = Seq(
      (1L, Some("en"), 10.0), (2L, Some("en"), 20.0),
      // a single row with NULL lang: a 1-row cohort that MUST suppress
      // at k=2 — the null-unsafe join shape released it verbatim
      (3L, None: Option[String], 30.0),
      // two NULL-lang rows elsewhere would pool: add one more to check
      // the NULL cohort is counted as ONE cohort (2 rows -> kept at k=2)
      (4L, None: Option[String], 40.0))
      .toDF("id", "lang", "v")
    val out = Privacy.suppressSmallCells(df, Seq("lang"), k = 2L)
      .orderBy("id").select("lang").as[String].collect().toSeq
    // the NULL cohort has 2 rows >= k, so it is NOT suppressed; its
    // released value is NULL-cast-to-string (null), not the marker
    assert(out === Seq("en", "en", null, null))
    // and at k=3 the 2-row NULL cohort suppresses like any other cell
    val out3 = Privacy.suppressSmallCells(df, Seq("lang"), k = 3L)
      .orderBy("id").select("lang").as[String].collect().toSeq
    assert(out3 === Seq("*", "*", "*", "*"))
  }

  test("l-diversity: low-distinct-sensitive cohorts suppress even when large") {
    // cohort "a": 4 rows but only 2 distinct sensitive values -> at
    // l=3 it suppresses DESPITE being k-anonymous at k=4; cohort "b":
    // 3 rows, 3 distinct -> kept
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "y"), (4L, "a", "y"),
      (5L, "b", "p"), (6L, "b", "q"), (7L, "b", "r"))
      .toDF("id", "q", "s")
    val out = Privacy.suppressLowDiversity(df, Seq("q"), "s", l = 3L)
      .orderBy("id").select("q").as[String].collect().toSeq
    assert(out === Seq("*", "*", "*", "*", "b", "b", "b"))
    // sensitive column itself passes through untouched
    assert(Privacy.suppressLowDiversity(df, Seq("q"), "s", 3L)
      .select("s").as[String].collect().sorted ===
      Seq("p", "q", "r", "x", "x", "y", "y"))
  }

  test("l-diversity: NULL sensitive never counts; all-NULL cohort fails closed") {
    val df = Seq(
      // cohort "a": 2 distinct + a NULL -> 2, suppressed at l=3
      (1L, "a", Some("x")), (2L, "a", Some("y")), (3L, "a", None: Option[String]),
      // cohort "n": ONLY nulls -> zero distinct, no count row at all —
      // the isNull branch must suppress (load-bearing, not backstop)
      (4L, "n", None: Option[String]), (5L, "n", None: Option[String]),
      // NULL quasi cohort with 3 distinct -> kept (null-safe join)
      (6L, null, Some("p")), (7L, null, Some("q")), (8L, null, Some("r")))
      .toDF("id", "q", "s")
    val out = Privacy.suppressLowDiversity(df, Seq("q"), "s", l = 3L)
      .orderBy("id").select("q").as[String].collect().toSeq
    assert(out === Seq("*", "*", "*", "*", "*", null, null, null))
  }

  test("k-anonymity and l-diversity compose") {
    val df = Seq(
      // big + diverse: survives both
      (1L, "a", "x"), (2L, "a", "y"), (3L, "a", "z"),
      // big + uniform: survives k, falls to l
      (4L, "u", "m"), (5L, "u", "m"), (6L, "u", "m"),
      // small + diverse: falls to k
      (7L, "t", "p"))
      .toDF("id", "q", "s")
    val both = Privacy.suppressLowDiversity(
      Privacy.suppressSmallCells(df, Seq("q"), k = 2L),
      Seq("q"), "s", l = 2L)
    val out = both.orderBy("id").select("q").as[String].collect().toSeq
    // "t" pooled into "*" by k-gate; the "*" pool then has 1 distinct
    // sensitive ("p") -> the l-gate keeps it pooled; "u" falls to l
    assert(out === Seq("a", "a", "a", "*", "*", "*", "*"))
  }

  test("frequency gate counts DISTINCT docs — repetition does not launder") {
    val df = Seq(
      // key "hot" in 3 docs -> kept
      (1L, "hot"), (2L, "hot"), (3L, "hot"),
      // key "spam" 5 times in ONE doc -> dropped at minDocs=2
      (7L, "spam"), (7L, "spam"), (7L, "spam"), (7L, "spam"), (7L, "spam"),
      // key "warm" in 2 docs -> kept at minDocs=2
      (1L, "warm"), (2L, "warm"))
      .toDF("doc", "key")
    val kept = Privacy.frequencyThreshold(df, "key", "doc", minDocs = 2L)
      .select("key").distinct().as[String].collect().toSet
    assert(kept === Set("hot", "warm"))
    // every original row of a surviving key passes (the semi join
    // keeps rows, not one-per-key)
    assert(Privacy.frequencyThreshold(df, "key", "doc", 2L).count() === 5L)
  }

  test("frequency gate: NULL keys fail closed even across many docs") {
    // xxhash64 skips null inputs, so an unguarded fingerprint semi-join
    // would pool all NULL keys into one pseudo-key and release them
    // once NULL rows span minDocs distinct docs — this pins the
    // fail-closed posture: NULL keys NEVER release, real keys unaffected
    val df = Seq(
      (1L, Some("hot")), (2L, Some("hot")),
      (3L, None: Option[String]), (4L, None: Option[String]),
      (5L, None: Option[String]))
      .toDF("doc", "key")
    val kept = Privacy.frequencyThreshold(df, "key", "doc", minDocs = 2L)
    assert(kept.filter(col("key").isNull).count() === 0L)
    assert(kept.count() === 2L)
  }
}
