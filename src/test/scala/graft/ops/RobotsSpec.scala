package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** RFC 9309 semantics through [[Robots]]: group assignment, agent
  * selection with '*' fallback, wildcard/anchor matching, longest-match
  * precedence with Allow winning ties, and the RFC defaults (no rules /
  * no match / empty Disallow ⇒ allowed).
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val robots =
    """# graft crawler policy
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/pub*
      |
      |User-agent: *
      |User-agent: otherbot
      |Disallow: /tmp/$
      |Disallow: /search
      |Allow: /search/docs
      |Disallow: /*.zip$
      |""".stripMargin

  private def decide(agent: String, paths: Seq[String],
                     body: String = robots): Map[String, Boolean] = {
    val rules = Robots.parseRules(
      Seq(("h", body)).toDF("host", "txt"), "host", "txt")
    val urls = paths.map(p => ("h", p)).toDF("host", "path")
    Robots.decisions(urls, "host", "path", rules, agent)
      .select("path", "allowed").as[(String, Boolean)].collect().toMap
  }

  test("named group: prefix disallow, longer Allow wins, default allow") {
    val d = decide("GraftBot", Seq(
      "/private/secret", "/private/pub1", "/private/public/x", "/open/page"))
    assert(d("/private/secret") === false)
    // Allow /private/pub* (len 12+) beats Disallow /private/ (len 9)
    assert(d("/private/pub1") === true)
    assert(d("/private/public/x") === true)
    // no rule matches: RFC default allow
    assert(d("/open/page") === true)
  }

  test("'*' fallback group: anchors, wildcards, tie goes to Allow") {
    val d = decide("newbot", Seq(
      "/tmp/", "/tmp/file", "/search?q=1", "/search/docs/a",
      "/data/x.zip", "/data/x.zip.txt"))
    // '$' anchor: exactly /tmp/ blocked, /tmp/file NOT (no prefix rule)
    assert(d("/tmp/") === false)
    assert(d("/tmp/file") === true)
    assert(d("/search?q=1") === false)
    // longer Allow overrides the /search disallow
    assert(d("/search/docs/a") === true)
    // '*.zip$': wildcard + anchor
    assert(d("/data/x.zip") === false)
    assert(d("/data/x.zip.txt") === true)
  }

  test("consecutive User-agent lines share one group") {
    val d = decide("otherbot", Seq("/search?q=1", "/private/secret"))
    assert(d("/search?q=1") === false)
    // the graftbot group does NOT apply to otherbot
    assert(d("/private/secret") === true)
  }

  test("empty Disallow is allow-all; rules before any UA line drop; no rules => allow") {
    val d1 = decide("anybot", Seq("/x"),
      body = "User-agent: *\nDisallow:\n")
    assert(d1("/x") === true)
    val d2 = decide("anybot", Seq("/x"),
      body = "Disallow: /x\nUser-agent: *\nAllow: /ok\n")
    // the pre-group Disallow is invalid per RFC and dropped
    assert(d2("/x") === true)
    val d3 = decide("anybot", Seq("/x"), body = "# nothing here\n")
    assert(d3("/x") === true)
  }

  test("LIKE metacharacters in rule paths stay literal") {
    val d = decide("anybot", Seq("/a%b/x", "/aXb/x", "/a_b", "/acb"),
      body = "User-agent: *\nDisallow: /a%b/\nDisallow: /a_b\n")
    assert(d("/a%b/x") === false)
    // '%' in the rule must NOT wildcard-match
    assert(d("/aXb/x") === true)
    assert(d("/a_b") === false)
    // '_' in the rule must NOT match any-single-char
    assert(d("/acb") === true)
  }

  private def delayOf(body: String, agent: String = "graftbot"): Option[Long] =
    Robots.crawlDelays(Seq(("h", body)).toDF("host", "txt"),
        "host", "txt", agent)
      .collect().headOption.map(_.getLong(1))

  test("crawl-delay: named group wins over '*', fractional seconds, max of duplicates") {
    assert(delayOf(
      "User-agent: graftbot\nCrawl-delay: 2.5\nUser-agent: *\nCrawl-delay: 10\n")
      === Some(2500L))
    assert(delayOf("User-agent: *\nCrawl-delay: 10\n") === Some(10000L))
    // two groups naming the agent: conservative max
    assert(delayOf(
      "User-agent: graftbot\nCrawl-delay: 1\nUser-agent: graftbot\nCrawl-delay: 3\n")
      === Some(3000L))
    // delay selection is independent of rule groups: a '*' delay
    // applies even when a NAMED group exists but carries no delay
    assert(delayOf(
      "User-agent: graftbot\nDisallow: /x\nUser-agent: *\nCrawl-delay: 4\n")
      === Some(4000L))
  }

  test("crawl-delay: non-numeric and negative values drop; absent host absent") {
    assert(delayOf("User-agent: *\nCrawl-delay: soon\n") === None)
    assert(delayOf("User-agent: *\nCrawl-delay: -5\n") === None)
    assert(delayOf("User-agent: *\nDisallow: /x\n") === None)
  }

  test("fetchSchedule: allowed-only, per-host slots, default delay, maxPerHost cap") {
    val bodies = Seq(
      ("ha", "User-agent: *\nDisallow: /no\nCrawl-delay: 2\n"),
      ("hb", "User-agent: *\nDisallow: /no\n")).toDF("host", "txt")
    val urls = Seq(("ha", "/a1"), ("ha", "/a2"), ("ha", "/no"),
      ("hb", "/b1"), ("hb", "/b2"), ("hb", "/b3"), ("hb", "/b4"))
      .toDF("host", "path")
    val out = Robots.fetchSchedule(urls, "host", "path",
        Robots.parseRules(bodies, "host", "txt"),
        Robots.crawlDelays(bodies, "host", "txt", "graftbot"),
        "graftbot", defaultDelayMs = 500L, maxPerHost = Some(3))
      .orderBy("host", "fetch_rank")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("ha", "/a1", 2000L, 1L, 0L), ("ha", "/a2", 2000L, 2L, 2000L),
      ("hb", "/b1", 500L, 1L, 0L), ("hb", "/b2", 500L, 2L, 500L),
      ("hb", "/b3", 500L, 3L, 1000L)))
  }
}
