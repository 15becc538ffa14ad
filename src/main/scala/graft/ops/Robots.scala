package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt (RFC 9309 / REP) parsing and allow/deny decisions — the
  * crawl-politeness gate every ingestion pipeline runs before fetching
  * (and re-runs retroactively when a corpus must honor late-arriving
  * robots rules). Reference behavior: rt-bigdata has no crawl layer;
  * this follows the public RFC 9309 semantics the way CCNet-class
  * pipelines apply them.
  *
  * Scope (documented, not accidental):
  *  - Group selection: a group applies to the fetch agent when its
  *    `User-agent` list names the agent token exactly
  *    (case-insensitive) — else the `*` groups apply. (RFC longest-
  *    prefix product-token matching is a data-file policy layer;
  *    exact-or-star is what the major OSS crawlers implement.)
  *  - Rule matching: RFC 9309 path patterns — literal prefix, `*`
  *    wildcard, trailing `$` anchor — translated to a SQL LIKE
  *    pattern (escape `%`/`_`/`\`, `*`→`%`, anchor drops the
  *    implicit trailing `%`), so BOTH engines evaluate the same
  *    match. Decision: longest pattern wins; `Allow` wins length
  *    ties; no matching rule (or no rules at all) ⇒ allowed.
  *  - Empty `Disallow:` (the classic allow-all idiom) contributes no
  *    rule. Rules before any `User-agent` line are invalid per RFC
  *    and dropped. `#` comments and blank lines stripped.
  *
  * Scale shape: parsing explodes robots BODIES (bounded: RFC caps a
  * robots.txt at 500 KiB) keyed by host — the window that assigns
  * group ids partitions by host, so no robots line ever crosses
  * hosts. Decisions join URLs to the per-host rule table on host —
  * the same key the politeness scheduler already partitions by; the
  * rule table is boilerplate-sized (rules × hosts, no page content)
  * and AQE broadcast-joins it when small.
  */
object Robots {

  /** Shared parse front half: robots blobs → directive lines with
    * RFC group ids ((host, pos, dir, value, group_id) plus the per-
    * group agent sets). A User-agent line NOT preceded by another
    * User-agent line starts a new group (consecutive UA lines share
    * the group, per RFC); the window partitions by host — robots
    * bodies never mix. `dirs` filters which directives survive.
    */
  private def groupedDirectives(df: DataFrame, hostCol: String,
                                textCol: String, dirs: Seq[String])
      : (DataFrame, DataFrame) = {
    val lines = df.select(col(hostCol).as("host"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "raw")))
      .select(col("host"), col("pos").cast("long").as("pos"),
        // strip comments, normalize tabs/CR to spaces, trim
        trim(regexp_replace(regexp_replace(col("raw"), "#.*", ""),
          "[\t\r]", " ")).as("line"))
    val parsed = lines.select(col("host"), col("pos"),
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)[ ]*:", 1)).as("dir"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+[ ]*:(.*)$", 1)).as("value"))
      .filter(col("dir").isin("user-agent" +: dirs: _*))
    val wOrd = Window.partitionBy("host").orderBy("pos")
    val grouped = parsed
      .withColumn("prev_dir", lag(col("dir"), 1).over(wOrd))
      .withColumn("new_group",
        (col("dir") === "user-agent" &&
          (col("prev_dir").isNull || col("prev_dir") =!= "user-agent"))
          .cast("long"))
      .withColumn("group_id", sum(col("new_group")).over(wOrd))
    val agents = grouped.filter(col("dir") === "user-agent")
      .groupBy(col("host"), col("group_id"))
      .agg(collect_set(lower(col("value"))).as("agents"))
    (grouped, agents)
  }

  /** robots.txt blobs → one row per effective rule:
    * (host, group_id, agents array, allow, pattern, pattern_len).
    */
  def parseRules(df: DataFrame, hostCol: String, textCol: String): DataFrame = {
    val (grouped, agents) =
      groupedDirectives(df, hostCol, textCol, Seq("allow", "disallow"))
    grouped
      .filter(col("dir").isin("allow", "disallow"))
      // rules before any User-agent line carry group_id 0: invalid per
      // RFC, dropped; empty-value rules (the allow-all idiom) drop too
      .filter(col("group_id") >= 1L && length(col("value")) > 0)
      .join(agents, Seq("host", "group_id"))
      .select(col("host"), col("group_id"), col("agents"),
        (col("dir") === "allow").as("allow"),
        col("value").as("pattern"),
        length(col("value")).cast("long").as("pattern_len"))
  }

  /** Per-host `Crawl-delay` for a fetch agent, in ms: the max delay
    * among groups naming the agent exactly; else the max among `*`
    * groups; hosts with neither are absent (callers coalesce their
    * fleet default). Crawl-delay is the de-facto REP extension
    * (unratified by RFC 9309 but honored by major crawlers); values
    * are seconds, fractional allowed, non-numeric dropped. Selection
    * is named-else-star over DELAY-carrying groups, independent of
    * which group supplied the allow/deny rules — a body may well put
    * its delay in the `*` group and agent-specific rules elsewhere.
    */
  def crawlDelays(df: DataFrame, hostCol: String, textCol: String,
                  agent: String): DataFrame = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    require(a.nonEmpty && a != "*", s"agent must be a concrete token, got '$agent'")
    val (grouped, agents) =
      groupedDirectives(df, hostCol, textCol, Seq("crawl-delay"))
    val delays = grouped
      .filter(col("dir") === "crawl-delay" && col("group_id") >= 1L)
      .join(agents, Seq("host", "group_id"))
      .select(col("host"),
        // try_cast: ANSI mode throws on junk like "Crawl-delay: soon";
        // a malformed delay must drop the row, not kill the scan
        floor(expr("try_cast(value AS DOUBLE)") * 1000.0)
          .cast("long").as("delay_ms"),
        array_contains(col("agents"), a).as("named"),
        array_contains(col("agents"), "*").as("generic"))
      .filter(col("delay_ms").isNotNull && col("delay_ms") >= 0L &&
        (col("named") || col("generic")))
    val hostMode = delays.groupBy(col("host"))
      .agg(max(col("named")).as("has_named"))
    delays.join(hostMode, "host")
      .filter(when(col("has_named"), col("named")).otherwise(col("generic")))
      .groupBy(col("host"))
      .agg(max(col("delay_ms")).as("delay_ms"))
  }

  /** Politeness-scheduled fetch frontier: [[decisions]]-allowed URLs
    * ranked per host (deterministic by path) with
    * `fetch_at_ms = (rank−1) · delay` — the slot plan a frontier
    * shard executes against one host. `maxPerHost` caps the horizon:
    * with it, the rank filter plans as `WindowGroupLimit` (a map-side
    * top-k heap per host), so a 10⁸-page host never fully sorts —
    * which is also the honest semantics: a crawl horizon of T ms
    * admits only T/delay URLs of a host no matter how many are known.
    * Output: (host, path, delay_ms, fetch_rank, fetch_at_ms).
    */
  def fetchSchedule(urls: DataFrame, hostCol: String, pathCol: String,
                    rules: DataFrame, delays: DataFrame, agent: String,
                    defaultDelayMs: Long,
                    maxPerHost: Option[Int] = None): DataFrame = {
    val allowed = decisions(urls, hostCol, pathCol, rules, agent)
      .filter(col("allowed"))
      .select(col("host"), col("path"))
    val w = Window.partitionBy(col("host")).orderBy(col("path"))
    val ranked = allowed
      .join(delays, Seq("host"), "left")
      .withColumn("delay_ms",
        coalesce(col("delay_ms"), lit(defaultDelayMs)))
      .withColumn("fetch_rank", row_number().over(w))
    val capped = maxPerHost match {
      case Some(k) => ranked.filter(col("fetch_rank") <= k)
      case None => ranked
    }
    capped.select(col("host"), col("path"), col("delay_ms"),
      col("fetch_rank").cast("long").as("fetch_rank"),
      ((col("fetch_rank") - 1).cast("long") * col("delay_ms"))
        .as("fetch_at_ms"))
  }

  /** RFC 9309 pattern → SQL LIKE pattern (escape '\'): `%`/`_`/`\`
    * escaped, `*` → `%`, a trailing `$` anchors (no implicit trailing
    * `%`). Exposed for the oracle/spec to reuse.
    */
  private[ops] def likePattern(pattern: Column): Column = {
    val escaped = regexp_replace(pattern, "([%_\\\\])", "\\\\$1")
    val starred = replace(escaped, lit("*"), lit("%"))
    when(pattern.endsWith("$"),
      starred.substr(lit(1), length(starred) - 1))
      .otherwise(concat(starred, lit("%")))
  }

  /** Allow/deny per URL row for a fixed fetch agent. `urls` must carry
    * `hostCol` and `pathCol` (path+query, the REP match target);
    * `rules` is [[parseRules]] output. Output: the url frame's two key
    * columns plus (matched_pattern, matched_len, allowed).
    */
  def decisions(urls: DataFrame, hostCol: String, pathCol: String,
                rules: DataFrame, agent: String): DataFrame = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    require(a.nonEmpty && a != "*", s"agent must be a concrete token, got '$agent'")
    val flagged = rules.select(col("host"), col("allow"), col("pattern"),
      col("pattern_len"),
      array_contains(col("agents"), a).as("named"),
      array_contains(col("agents"), "*").as("generic"))
    // per-host: the named group(s) if any exist, else the '*' group(s)
    val hostMode = flagged.groupBy(col("host"))
      .agg(max(col("named")).as("has_named"))
    val selected = flagged.join(hostMode, "host")
      .filter(when(col("has_named"), col("named")).otherwise(col("generic")))
      .withColumn("like_pat", likePattern(col("pattern")))
    val u = urls.select(col(hostCol).as("host"), col(pathCol).as("path"))
    val joined = u.join(selected, Seq("host"), "left")
    // non-foldable LIKE pattern (rules are DATA): Spark compiles the
    // pattern per row — fine, the pattern side is rule-table-sized
    val hit = like(col("path"), col("like_pat"), lit("\\"))
    // longest pattern wins, Allow wins ties (struct max: len first,
    // then allow — false < true); no hit at all ⇒ allowed (RFC default)
    joined.groupBy(col("host"), col("path"))
      .agg(max(when(col("pattern").isNotNull && hit,
        struct(col("pattern_len").as("l"), col("allow").as("a"),
          col("pattern").as("p")))).as("best"))
      .select(col("host"), col("path"),
        col("best.p").as("matched_pattern"),
        col("best.l").as("matched_len"),
        coalesce(col("best.a"), lit(true)).as("allowed"))
  }
}
