package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  // dictionary with a fuzzy chain (widget/widgit/widgets), an exact
  // repeat (rows dedupe to one dictionary entry), and an unrelated block
  private def rows = Seq(
    "blue widget", "blue widgit", "blue widgets",
    "blue widget", // duplicate row: dictionary must collapse it
    "red gear", "red bear", "small ring"
  ).toDF("name")

  private val firstToken = (v: org.apache.spark.sql.Column) => split(v, " ").getItem(0)

  test("dictionaryPairs finds in-block pairs within maxDist, a<b, with exact distances") {
    val got = FuzzyJoin.dictionaryPairs(rows, "name", maxDist = 2, firstToken)
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(
      ("blue widget", "blue widgit", 1),
      ("blue widget", "blue widgets", 1),
      ("blue widgets", "blue widgit", 2),
      ("red bear", "red gear", 1)), got.toString)
  }

  test("pairs across blocks are by-contract unmatched") {
    // "red gear" vs "red bear" match under first-token blocking but NOT
    // under second-token blocking (gear vs bear are different blocks)
    val got = FuzzyJoin.dictionaryPairs(rows, "name", maxDist = 2,
      v => split(v, " ").getItem(1)).as[(String, String, Int)].collect().toSet
    assert(!got.exists(p => p._1.contains("red")), got.toString)
  }

  test("canonicalize maps chains to the lexicographic minimum and singletons to themselves") {
    val got = FuzzyJoin.canonicalize(rows, "name", maxDist = 2, firstToken)
      .as[(String, String)].collect().toMap
    // widget~widgit and widget~widgets chain into ONE cluster even
    // though widgit~widgets is at the maxDist boundary — canonical is
    // the lexicographic min of the whole component
    assert(got("blue widget") == "blue widget")
    assert(got("blue widgit") == "blue widget")
    assert(got("blue widgets") == "blue widget")
    assert(got("red bear") == "red bear")
    assert(got("red gear") == "red bear")
    assert(got("small ring") == "small ring")
    assert(got.size == 6) // the distinct dictionary, duplicate row collapsed
  }

  test("bestMatch picks the top-JW candidate per dirty value, ties toward the greatest string") {
    val dirty = Seq("blue widgt", "red gearr", "blue zzzzzz").toDF("name")
    val dim = Seq("blue widget", "blue widget2", "red gear", "red bear").toDF("p")
    val got = FuzzyJoin.bestMatch(dirty, "name", dim, "p",
      minSimE6 = 700000L, v => split(v, " ").getItem(0))
      .select("value", "matched").as[(String, String)].collect().toMap
    assert(got("blue widgt") == "blue widget", got.toString)
    assert(got("red gearr") == "red gear", got.toString)
    // no candidate reaches the floor -> the dirty value is absent
    assert(!got.contains("blue zzzzzz"), got.toString)
    // deterministic tie: two candidates at the same score resolve to the
    // lexicographically greatest
    val tied = FuzzyJoin.bestMatch(
      Seq("aax").toDF("name"), "name",
      Seq("aab", "aac").toDF("p"), "p", 0L, v => substring(v, 1, 1))
      .select("matched").as[String].head()
    assert(tied == "aac")
  }

  test("threshold levenshtein early-exit agrees with the unbounded distance") {
    val dict = Seq(("abcdef", "abcxyz")).toDF("a", "b")
    val (bounded, full) = dict.select(
      levenshtein(col("a"), col("b"), 3), levenshtein(col("a"), col("b")))
      .as[(Int, Int)].head()
    assert(bounded == 3 && full == 3)
    val over = dict.select(levenshtein(col("a"), col("b"), 2)).as[Int].head()
    assert(over == -1)
  }
}
