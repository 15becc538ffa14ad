package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first stage of every web-crawl
  * training-data pipeline (Common-Crawl WET generation, CCNet,
  * RefinedWeb): strip markup, drop script/style/comment payloads,
  * decode the standard character entities, and collapse whitespace, so
  * the downstream quality/dedup family ([[Quality]], [[Dedup]]) sees
  * prose, not tag soup.
  *
  * Everything here is a pure `Column` chain over codegen'd
  * `regexp_replace`/`replace` — a narrow per-row map with NO shuffle
  * and no UDF, so at 100 TB it rides the scan (WholeStageCodegen) and
  * the raw HTML never enters an exchange; only whatever the caller
  * aggregates afterwards does. The patterns avoid constructs that
  * diverge between engines (no `\s` — Java includes \x0B where RE2
  * does not; no lookaround — RE2 has none), so an external SQL engine
  * can replay the extraction exactly; replacement backrefs are `$1`
  * here and `\1` in the DuckDB oracle dialect.
  *
  * Deliberately a REGEX extractor, not an HTML parser: attribute
  * values containing a raw `>` mis-split (rare in crawl practice and
  * always recoverable — the tag remnant is visible in the output).
  * The alternative (a stateful char-walk) would leave codegen for a
  * per-row loop with no accuracy win on the overwhelming majority of
  * real markup; jusText/trafilatura-class boilerplate DOM scoring is
  * out of scope (the repetition/df machinery in [[Quality]] and
  * [[SpanScrub]] covers boilerplate REMOVAL corpus-statistically).
  */
object Html {

  /** Decode the six named/numeric entities that dominate real markup
    * (`&lt; &gt; &quot; &#39; &apos; &nbsp;`), `&amp;` LAST so
    * double-escaped text (`&amp;lt;`) decodes one level per pass —
    * the standard order.
    */
  def decodeEntities(html: Column): Column = {
    val step = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&")
    step.foldLeft(html) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
  }

  /** The non-content payload blocks: script and style bodies (their
    * text is code, not prose) and comments. Removed BEFORE tag
    * stripping so `var t = 1 < 2 && 3 > 2;` inside a script cannot
    * shed fragments into the output.
    */
  private def dropPayloadBlocks(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", "")
    regexp_replace(noStyle, "(?s)<!--.*?-->", "")
  }

  /** Visible text of an HTML document: payload blocks dropped, every
    * remaining tag replaced by a space (so `…word</td><td>word…` does
    * not fuse), entities decoded AFTER tag stripping (a literal
    * `&lt;b&gt;` in the source stays the text "<b>", it does not
    * become a tag), whitespace collapsed, trimmed.
    */
  def extractText(html: Column): Column =
    trim(regexp_replace(
      decodeEntities(
        regexp_replace(dropPayloadBlocks(html), "(?s)<[^>]+>", " ")),
      "[ \\t\\r\\n]+", " "))

  /** Visible text with BLOCK STRUCTURE kept: block-level tag
    * boundaries (`p div br li ul ol h1-h6 tr table title head body
    * html section article header footer blockquote pre`) become
    * newlines, inline tags become spaces, then per-line whitespace is
    * collapsed, line edges trimmed, and blank lines dropped — the
    * newline-joined lines are what a per-domain boilerplate pass
    * ([[SpanScrub.scrubBoilerplateLines]]) needs: one DOM block ≈ one
    * line, so a nav bar or footer is a single removable unit instead
    * of being fused into the prose ([[extractText]] deliberately
    * collapses ALL whitespace and is the right call for dedup
    * shingling, wrong for line-frequency statistics). Same codegen'd
    * regexp chain discipline as [[extractText]]: no `\s`, no
    * lookaround, replayable by an external SQL engine step for step.
    */
  def extractTextLines(html: Column): Column = {
    val blockTag = "(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|title|head|" +
      "body|html|section|article|header|footer|blockquote|pre)\\b[^>]*>"
    val blocks = regexp_replace(dropPayloadBlocks(html), blockTag, "\n")
    val decoded = decodeEntities(regexp_replace(blocks, "(?s)<[^>]+>", " "))
    val oneSpace = regexp_replace(decoded, "[ \\t\\r]+", " ")
    val trimmedLines = regexp_replace(oneSpace, "[ ]*\\n[ ]*", "\n")
    val noBlank = regexp_replace(trimmedLines, "\\n+", "\n")
    regexp_replace(noBlank, "^[\\n ]+|[\\n ]+$", "")
  }

  /** `<title>` content (first occurrence), entity-decoded and
    * whitespace-collapsed; empty string when absent — a crawl-scale
    * pipeline wants a total function, not a null to trip joins.
    */
  def extractTitle(html: Column): Column =
    trim(regexp_replace(
      decodeEntities(
        regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)),
      "[ \\t\\r\\n]+", " "))

  /** Count of anchor tags carrying an href — the link-density signal
    * quality classifiers use (nav/listing pages are link-dense, prose
    * is not). Counts tags, not unique targets.
    */
  def countLinks(html: Column): Column =
    size(regexp_extract_all(html, lit("(?is)<a\\b[^>]*href"), lit(0)))

  /** Link density in e6 fixed point: links per 100 extracted-text
    * chars (0 when the text is empty) — join-free, rides the same
    * projection as [[extractText]].
    */
  def linkDensityE6(html: Column): Column = {
    val textLen = length(extractText(html))
    // floor of a double quotient of exact-in-double integers — the
    // portable fixed-point form (SparkEntry determinism rules)
    when(textLen === 0, lit(0L)).otherwise(
      floor(countLinks(html).cast("long") * lit(100000000L) / textLen)
        .cast("long"))
  }
}
