package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class AhoCorasickSpec extends AnyFunSuite {

  /** Naive per-position oracle: count occurrences of `p` in `t`,
    * overlapping included.
    */
  private def naive(t: String, p: String): Long =
    (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)).toLong

  test("overlapping occurrences each count") {
    val ac = AhoCorasick.build(Seq("aa", "aaa"))
    val got = ac.countAll("aaaa")
    assert(got.toSeq == Seq(3L, 2L)) // "aa" at 0,1,2; "aaa" at 0,1
  }

  test("suffix patterns fire inside longer matches (fail-chain outputs)") {
    // "ta" and "a" are proper suffixes of "data" — every "data" must
    // also fire both
    val ac = AhoCorasick.build(Seq("data", "ta", "a"))
    val got = ac.countAll("data data")
    assert(got(0) == 2L)
    assert(got(1) == 2L)
    assert(got(2) == 4L)
  }

  test("phrase-with-space patterns match across word boundaries") {
    val ac = AhoCorasick.build(Seq("batch batch", "an or"))
    assert(ac.countAll("batch batch batch").toSeq == Seq(2L, 0L))
    assert(ac.countAll("scan order")(1) == 1L) // "sc[an or]der"
  }

  test("duplicate patterns each fire their own index") {
    val ac = AhoCorasick.build(Seq("x", "x"))
    assert(ac.countAll("xx").toSeq == Seq(2L, 2L))
  }

  test("empty text and miss-only text count zero; containsAny agrees") {
    val ac = AhoCorasick.build(Seq("needle"))
    assert(ac.countAll("").toSeq == Seq(0L))
    assert(ac.countAll("haystack without it").toSeq == Seq(0L))
    assert(!ac.containsAny("haystack without it"))
    assert(ac.containsAny("the needle is here"))
  }

  test("non-ASCII patterns (CJK + supplementary plane) count correctly") {
    // the surrogate-pair char exercises UTF-16-unit matching: literal
    // occurrence counts are unit-independent
    val ac = AhoCorasick.build(Seq("数据", "😀"))
    assert(ac.countAll("数据流 数据仓库 😀😀").toSeq == Seq(2L, 2L))
  }

  test("empty pattern set and empty pattern are rejected") {
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("ok", "")))
  }

  test("scrub removes the mask union: overlaps, nesting, and the clean fast path") {
    val ac = AhoCorasick.build(Seq("aa", "data", "ta"))
    // overlapping "aa" occurrences cover the whole run
    assert(ac.scrub("xaaay") == "xy")
    // "ta" nests inside "data": union is just the "data" span
    assert(ac.scrub("my data set") == "my  set")
    // "ta" also fires alone
    assert(ac.scrub("delta") == "del")
    // clean text returns the SAME instance (zero-allocation fast path)
    val clean = "nothing to see"
    assert(ac.scrub(clean) eq clean)
    assert(ac.scrub("") eq "")
  }

  test("scrub equals the naive mask replay on random inputs") {
    val rnd = new scala.util.Random(43)
    val alphabet = "abd "
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0 until 30).foreach { _ =>
      val pats = (0 until (1 + rnd.nextInt(5)))
        .map(_ => randStr(1 + rnd.nextInt(3))).distinct
      val text = randStr(120)
      val covered = new Array[Boolean](text.length)
      for (p <- pats; i <- 0 to text.length - p.length
           if text.regionMatches(i, p, 0, p.length); j <- i until i + p.length)
        covered(j) = true
      val want = text.zipWithIndex.collect {
        case (c, i) if !covered(i) => c
      }.mkString
      assert(AhoCorasick.build(pats).scrub(text) == want, s"patterns=$pats")
    }
  }

  test("randomized equivalence with the naive per-position scan") {
    val rnd = new scala.util.Random(41)
    val alphabet = "abc "
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0 until 50).foreach { _ =>
      val pats = (0 until (1 + rnd.nextInt(6)))
        .map(_ => randStr(1 + rnd.nextInt(4))).distinct
      val text = randStr(200)
      val ac = AhoCorasick.build(pats)
      val got = ac.countAll(text).toSeq
      val want = pats.map(naive(text, _))
      assert(got == want, s"patterns=$pats")
      assert(ac.containsAny(text) == want.exists(_ > 0L))
    }
  }
}
