package graft.functions

import scala.collection.mutable

/** Aho–Corasick multi-pattern automaton (Aho & Corasick, CACM 1975):
  * count EVERY occurrence of EVERY pattern in one left-to-right pass
  * over the text — the substring-level member of the decontamination
  * family. The exact-key gates (q64/q85) ask "is this document one of
  * the benchmark rows"; the n-gram gate (q108) asks "how much token
  * mass overlaps"; this asks "does any of N literal strings appear
  * ANYWHERE inside the text" — the shape of benchmark-string
  * decontamination (canary strings, eval answers), banned-phrase
  * filtering, and PII dictionary scans.
  *
  * Why an automaton and not `contains`: N patterns × contains is
  * O(N·|text|) comparisons per document — at 10⁴ benchmark strings
  * against 100 TB of text that is the difference between one corpus
  * pass and ten thousand. The automaton compiles ONCE on the driver
  * and ships to executors as one reference object inside the
  * expression (kilobytes per thousand short patterns — a
  * broadcast-dim-sized artifact, never a shuffle); matching is
  * O(|text| + matches) regardless of N.
  *
  * Determinism contract: matching is over Java chars (UTF-16 units).
  * A literal pattern's occurrence COUNT is unit-independent (an
  * occurrence is an occurrence whether you index by code point or by
  * UTF-16 unit), so the DuckDB oracle may replay per-code-point —
  * counts agree on any input.
  *
  * Counts are per pattern INDEX (the caller's pattern order), each
  * occurrence counted even when occurrences overlap ("batch batch"
  * occurs twice in "batch batch batch") and even when one pattern is
  * a substring of another ("ta" fires inside every "data" — the
  * suffix output link below is what makes suffix patterns fire).
  *
  * The frozen form is flat primitive arrays (per-state sorted char
  * keys + targets, binary-searched): no boxing, no hash probes on the
  * per-character hot path, and compact java serialization.
  */
final class AhoCorasick private (
    private val charKeys: Array[Array[Char]],
    private val charTargets: Array[Array[Int]],
    private val fail: Array[Int],
    // pattern indices that end EXACTLY at this state (own outputs
    // only). Suffix matches are reached through `outLink` at match
    // time instead of being merged eagerly: the r17 eager merge was
    // O(states × matching patterns) driver/plan memory on
    // shared-suffix dictionaries (e.g. 10⁴ patterns all ending in the
    // same domain suffix each replicate that suffix's indices into
    // every descendant state). The link walk is amortized free — each
    // hop yields at least one occurrence, so matching stays
    // O(|text| + matches).
    private val out: Array[Array[Int]],
    // nearest proper-suffix state with a non-empty own-output set
    // (-1 when none): the standard Aho–Corasick output link
    private val outLink: Array[Int],
    private val patternLengths: Array[Int],
    val nPatterns: Int) extends Serializable {

  private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val i = java.util.Arrays.binarySearch(charKeys(s), c)
      if (i >= 0) return charTargets(s)(i)
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Occurrence counts per pattern index, one pass over `text`. */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](nPatterns)
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      state = step(state, text.charAt(i))
      // own outputs, then every suffix output through the link chain
      var o = state
      while (o != -1) {
        val hits = out(o)
        var j = 0
        while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
        o = outLink(o)
      }
      i += 1
    }
    counts
  }

  /** Remove every character covered by ANY pattern occurrence — the
    * mask-union scrub semantics (deterministic and order-free: the
    * union of occurrence intervals doesn't depend on match order, so
    * overlapping and nested occurrences compose without a
    * leftmost-longest tie rule). Same single pass, plus one
    * length-of-text boolean mask; the common clean-document case
    * allocates nothing and returns the input string.
    */
  def scrub(text: String): String = {
    val n = text.length
    var covered: Array[Boolean] = null
    var state = 0
    var i = 0
    while (i < n) {
      state = step(state, text.charAt(i))
      var o = state
      while (o != -1) {
        val hits = out(o)
        var j = 0
        while (j < hits.length) {
          if (covered == null) covered = new Array[Boolean](n)
          var p = i - patternLengths(hits(j)) + 1
          while (p <= i) { covered(p) = true; p += 1 }
          j += 1
        }
        o = outLink(o)
      }
      i += 1
    }
    if (covered == null) text
    else {
      val sb = new java.lang.StringBuilder(n)
      i = 0
      while (i < n) { if (!covered(i)) sb.append(text.charAt(i)); i += 1 }
      sb.toString
    }
  }

  /** True iff ANY pattern occurs — same pass, early exit on the first
    * hit (the gating fast path: clean documents scan to the end,
    * contaminated ones exit at their first occurrence).
    */
  def containsAny(text: String): Boolean = {
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      state = step(state, text.charAt(i))
      // any own output here, or any output reachable through the
      // suffix chain — one O(1) check (outLink is only non-(-1) when
      // a suffix output exists)
      if (out(state).length > 0 || outLink(state) != -1) return true
      i += 1
    }
    false
  }
}

object AhoCorasick {

  /** Compile the pattern set. Patterns must be non-empty (an empty
    * pattern would match at every position — rejected loudly);
    * duplicates are allowed and each fires its own index.
    */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "pattern set must be non-empty")
    patterns.zipWithIndex.foreach { case (p, i) =>
      require(p != null && p.nonEmpty, s"pattern $i is null/empty")
    }
    val next = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val ends = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var s = 0
      p.foreach { c =>
        s = next(s).getOrElseUpdate(c, {
          next += mutable.HashMap.empty[Char, Int]
          ends += Nil
          next.length - 1
        })
      }
      ends(s) = idx :: ends(s)
    }
    val n = next.length
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    val outLink = new Array[Int](n)
    // the root matches nothing: every pattern is non-empty, so no
    // pattern ends at depth 0
    out(0) = Array.emptyIntArray
    outLink(0) = -1
    val queue = mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach { t =>
      fail(t) = 0
      out(t) = ends(t).reverse.toArray
      outLink(t) = -1 // the root never has outputs
      queue += t
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      next(s).foreach { case (c, t) =>
        // fail(t) = the deepest trie node spelling a proper suffix of
        // t's string: walk s's fail chain until a c-transition exists.
        // Never t itself — t sits strictly deeper than any node
        // reachable from its parent's fail chain.
        var f = fail(s)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(t) = next(f).getOrElse(c, 0)
        out(t) = ends(t).reverse.toArray
        // output link = nearest proper-suffix state with own outputs:
        // fail(t) itself if it ends a pattern, else inherit ITS link.
        // O(states + Σ ends) total memory — the r17 eager fail-chain
        // merge replicated shared-suffix outputs into every descendant
        // (ADVICE: quadratic for pathological dictionaries).
        outLink(t) = if (out(fail(t)).length > 0) fail(t)
                     else outLink(fail(t))
        queue += t
      }
    }
    val charKeys = new Array[Array[Char]](n)
    val charTargets = new Array[Array[Int]](n)
    var s = 0
    while (s < n) {
      val entries = next(s).toArray.sortBy(_._1)
      charKeys(s) = entries.map(_._1)
      charTargets(s) = entries.map(_._2)
      s += 1
    }
    new AhoCorasick(charKeys, charTargets, fail, out, outLink,
      patterns.map(_.length).toArray, patterns.size)
  }
}
