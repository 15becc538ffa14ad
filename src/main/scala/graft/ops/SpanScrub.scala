package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Substring-level duplicate REMOVAL — the "exact substring dedup"
  * deliverable from the training-data literature (Lee et al., ACL'22:
  * dedup the duplicated SPAN, keep the document), as the surgical
  * counterpart of [[Dedup.sharedWindowPairs]] (which only reports doc
  * pairs): every k-char window sampled at `stride` that occurs in more
  * than `maxDf` distinct documents (boilerplate headers, license
  * blocks, templated navigation) is cut from every document carrying
  * it; the unique remainder is kept and re-joined.
  *
  * Shape (the family doctrine):
  *  1. one explode pass → (id, off, window) rows, O(len/stride) per
  *     doc;
  *  2. window document-frequency via a distinct + count aggregate —
  *     this variant keys on the window STRING so an external engine
  *     can replay it exactly (the 100 TB swap is keying steps 2-3 on
  *     `xxhash64(win)` — 8-byte keys in the exchange, same pattern as
  *     the portable/production simhash flavors);
  *  3. hot offsets per doc: windows with df > maxDf, collected and
  *     sorted per document — rows exist ONLY for docs that carry hot
  *     spans (at scale a small minority);
  *  4. span surgery per row, zero shuffles: `transform` over the
  *     sorted offsets emits the kept slice BEFORE each hot span
  *     (empty when spans overlap — all spans are length k, so the
  *     slice is text(offs[i-1]+k, offs[i])), then `array_join` +
  *     the tail slice assemble the clean text in one pass. Docs with
  *     no hot span pass through the left join untouched.
  *
  * The lambdas only touch attribute references (no recomputed
  * expressions inside the loop — the [[graft.functions.TextFunctions.shingles]]
  * hazard), and the per-element work is O(span) substring copies —
  * a (cursor, acc)-state `aggregate` fold was rejected because it
  * rebuilds the accumulated string per element, O(len × nSpans).
  */
object SpanScrub {

  def scrubRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                         k: Int, stride: Int, maxDf: Long): DataFrame = {
    require(k > 0 && stride > 0, s"k=$k stride=$stride must be positive")
    val text = col(textCol)
    // ScanFanOut (r20, guide §2.5): the window pass materializes len/stride
    // k-char substrings per doc plus a distinct — heavy per row, and a
    // narrow chain from the scan (measured on q102: 19 tasks, wall ≈ task
    // CPU 3.7 s). Same winning profile as ngramOverlapFraction; the
    // surgery join below keeps df itself untouched.
    val wins = ScanFanOut(df.select(col(idCol).as("__id"), text.as("__t")))
      .filter(length(col("__t")) >= k)
      .select(col("__id"),
        explode(sequence(lit(0), length(col("__t")) - k, lit(stride))).as("off"),
        col("__t"))
      .select(col("__id"), col("off"),
        col("__t").substr(col("off") + 1, lit(k)).as("win"))
    // document frequency per window: distinct (id, win) first so a
    // window repeated WITHIN one doc counts once
    val wdf = wins.select(col("__id"), col("win")).distinct()
      .groupBy(col("win")).agg(count(lit(1)).as("wdf"))
      .filter(col("wdf") > maxDf)
    val hotOffs = wins.join(wdf, "win")
      .groupBy(col("__id"))
      .agg(array_sort(collect_set(col("off"))).as("__offs"))
    val joined = df.join(hotOffs, df(idCol) === hotOffs("__id"), "left")
    // left-to-right surgery, O(len) total per doc: all spans have
    // length k and the offsets are sorted ascending, so after
    // processing offset o the cursor is exactly o + k — the kept slice
    // BEFORE element i is text(offs[i-1] + k, offs[i]), empty when the
    // spans overlap. transform + array_join assembles the slices with
    // one pass (a (cursor, acc)-state fold would rebuild the
    // accumulated string per element: O(len × nSpans) on exactly the
    // template-heavy docs this operator targets).
    val pieces = transform(col("__offs"), (o, i) =>
      when(i === 0, text.substr(lit(1), o))
        .otherwise {
          val prevEnd = element_at(col("__offs"), i) + k // offs[i-1] + k
          when(o > prevEnd, text.substr(prevEnd + 1, o - prevEnd))
            .otherwise(lit(""))
        })
    val lastEnd = element_at(col("__offs"), -1) + k
    val folded = concat(array_join(pieces, ""),
      when(length(text) > lastEnd,
        text.substr(lastEnd + 1, length(text) - lastEnd))
        .otherwise(lit("")))
    joined.select(
      df(idCol),
      when(col("__offs").isNull, text).otherwise(folded).as("clean_text"),
      length(text).as("__len"))
      .withColumn("removed_chars",
        (col("__len") - length(col("clean_text"))).cast("long"))
      .drop("__len")
  }

  /** PARAGRAPH-level exact dedup with in-place rebuild — the
    * MassiveText/RefinedWeb "remove repeated paragraphs, keep the
    * document" pass at a structural boundary instead of
    * [[scrubRepeatedSpans]]'s sliding windows: the text splits on
    * `sep`, and every paragraph occurrence that duplicates an EARLIER
    * one — (doc, pos) lexicographically, so the corpus-first occurrence
    * survives and within-doc repeats dedup too — is deleted before the
    * document is rejoined with the same separator (split+join on a
    * literal separator is lossless, so untouched documents round-trip
    * byte-identical). Paragraphs shorter than `minLen` chars never
    * participate (they pass through), keeping "Yes." and empty
    * structural slots intact.
    *
    * Shape (the family doctrine):
    *  1. explode → (doc, pos, xxhash64(para)) — paragraph STRINGS drop
    *     before any exchange (8-byte keys only; the q108 hashed-token
    *     contract);
    *  2. first occurrence per paragraph = `min(struct(doc, pos))` — a
    *     map-side-combinable argmin (the q91 pattern), no window;
    *  3. kill-list = occurrences ≠ their paragraph's min, grouped per
    *     doc — DUP-sized, not corpus-sized (AQE broadcasts it back);
    *  4. rebuild map-side: re-split the original text, drop killed
    *     positions, rejoin. Per-doc cost is O(nParas × kills) via
    *     `array_contains` — kills per doc is small by construction
    *     (it is the document's own duplicated-paragraph count).
    */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
                      sep: String = "\n\n", minLen: Int = 1): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    require(minLen >= 1, "minLen must be >= 1")
    val qsep = java.util.regex.Pattern.quote(sep)
    val text = col(textCol)
    val paras = split(text, qsep, -1)
    // persisted: the argmin aggregate and the kill join both consume
    // the occurrence frame; uncached the split+hash pass runs twice.
    // 20 bytes/paragraph. Lifecycle: CacheScope.release.
    val occ = CacheScope.persist(
      df.select(col(idCol).as("__id"), posexplode(paras))
        .filter(length(col("col")) >= minLen)
        .select(col("__id"), col("pos").cast("long").as("pos"),
          xxhash64(col("col")).as("h")))
    val first = occ.groupBy(col("h"))
      .agg(min(struct(col("__id"), col("pos"))).as("m"))
    val kills = occ.join(first, "h")
      .filter(!(col("__id") === col("m.__id") && col("pos") === col("m.pos")))
      .groupBy(col("__id")).agg(array_sort(collect_list(col("pos"))).as("__kill"))
    val joined = df.join(kills, df(idCol) === kills("__id"), "left")
    val idx = transform(paras, (p, i) =>
      struct(p.as("p"), i.cast("long").as("i")))
    val kept = filter(idx, s => !array_contains(col("__kill"), s.getField("i")))
    joined.select(
      df(idCol),
      when(col("__kill").isNull, text)
        .otherwise(array_join(transform(kept, s => s.getField("p")), sep))
        .as("clean_text"),
      coalesce(size(col("__kill")), lit(0)).cast("long").as("removed_paras"))
  }

  /** PER-DOMAIN boilerplate line removal — the site-template pass of a
    * crawl pipeline (CCNet/trafilatura class): a LINE that appears on a
    * large fraction of the SAME domain's pages is chrome (navigation,
    * cookie banners, copyright footers), not content — it is deleted
    * from every page of that domain, wherever it occurs. The domain
    * grouping is what distinguishes this from [[dedupParagraphs]]
    * (corpus-wide keep-FIRST): boilerplate has no "first legitimate
    * occurrence" — every copy goes — and a line that is boilerplate on
    * one site is legitimate content on another (a quote of a famous
    * footer), so frequencies must never pool across domains.
    *
    * Hot threshold per domain: `df ≥ max(minAbs, ⌈minFracE6·nDocs/10⁶⌉)`
    * — the fraction rides domain size (a 1M-page domain needs ~50% of
    * pages, not 2) while `minAbs ≥ 2` keeps singleton domains inert (a
    * fraction alone would mark EVERY line of a 1-page domain hot). All
    * integer arithmetic (the e6 doctrine): the ceil is
    * `(n·frac + 999999) div 10⁶`, engine-exact.
    *
    * Shape (the family doctrine):
    *  1. explode → (id, domain, pos, xxhash64(line)): line STRINGS drop
    *     before any exchange (the q108 8-byte-key contract); lines
    *     shorter than `minLen` never participate ("" between structural
    *     newlines, "Yes.") — they pass through untouched;
    *  2. per-domain doc counts — domain-count-sized aggregate;
    *  3. line df within domain: distinct (domain, id, h) then a
    *     combinable count by (domain, h);
    *  4. kill-list per doc = ALL positions of hot lines — boilerplate-
    *     sized, AQE broadcasts it back;
    *  5. rebuild map-side exactly like [[dedupParagraphs]] (split, drop
    *     killed positions, rejoin — lossless for untouched docs).
    *
    * Output: (idCol, clean_text, removed_lines).
    */
  def scrubBoilerplateLines(df: DataFrame, idCol: String, domainCol: String,
                            textCol: String, sep: String = "\n",
                            minFracE6: Long = 500000L, minAbs: Long = 2L,
                            minLen: Int = 1): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    require(minFracE6 >= 0L && minFracE6 <= 1000000L,
      s"minFracE6=$minFracE6 must be a fraction in e6 fixed point [0, 1000000]")
    require(minAbs >= 2L,
      s"minAbs=$minAbs must be >= 2: at 1 every line of every singleton-domain page is 'boilerplate'")
    require(minLen >= 1, "minLen must be >= 1")
    val qsep = java.util.regex.Pattern.quote(sep)
    val text = col(textCol)
    val lines = split(text, qsep, -1)
    // persisted: the df aggregate and the kill join both consume the
    // occurrence frame (the dedupParagraphs lifecycle; CacheScope.release)
    val occ = CacheScope.persist(
      df.select(col(idCol).as("__id"), col(domainCol).as("__dom"),
          posexplode(lines))
        .filter(length(col("col")) >= minLen)
        .select(col("__id"), col("__dom"), col("pos").cast("long").as("pos"),
          xxhash64(col("col")).as("h")))
    val nDocs = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("__n"))
    // distinct first: a line repeated WITHIN one page counts once
    // toward "fraction of the domain's pages carrying it"
    val ldf = occ.select(col("__dom"), col("__id"), col("h")).distinct()
      .groupBy(col("__dom"), col("h")).agg(count(lit(1)).as("ldf"))
    val hot = ldf.join(nDocs, "__dom")
      .filter(col("ldf") >= greatest(lit(minAbs),
        expr(s"(__n * ${minFracE6}L + 999999L) div 1000000L")))
      .select(col("__dom"), col("h"))
    val kills = occ.join(hot, Seq("__dom", "h"))
      .groupBy(col("__id"))
      .agg(array_sort(collect_list(col("pos"))).as("__kill"))
    val joined = df.join(kills, df(idCol) === kills("__id"), "left")
    val idx = transform(lines, (p, i) =>
      struct(p.as("p"), i.cast("long").as("i")))
    val kept = filter(idx, s => !array_contains(col("__kill"), s.getField("i")))
    joined.select(
      df(idCol),
      when(col("__kill").isNull, text)
        .otherwise(array_join(transform(kept, s => s.getField("p")), sep))
        .as("clean_text"),
      coalesce(size(col("__kill")), lit(0)).cast("long").as("removed_lines"))
  }
}
