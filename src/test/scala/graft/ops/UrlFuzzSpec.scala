package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded-fuzz invariants for the crawl-facing string/byte operators —
  * the bug class every r14 ADVICE item belonged to (a regex matching
  * inside a param VALUE, a userinfo colon defeating the port strip)
  * is exactly a violated invariant on adversarial inputs. One
  * DataFrame pass per invariant over a deterministic corpus (seeded
  * RNG, so a failure reproduces), assembled from URL/byte FRAGMENTS so
  * the delimiter collisions the regexes must survive actually occur —
  * uniform random characters would almost never produce `?` `&` `@`
  * `:` adjacencies.
  */
class UrlFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xC0FFEE)
  private val fragments = Array(
    "http://", "https://", "HTTP://", "a.Example.COM", "WWW.x.co.uk",
    "user:p%40ss@", "xn--bcher-kva.de", ":80", ":443", ":8080", "/",
    "/p/1", "//", "?", "?q=1", "&utm_source=x", "&x=?utm_medium=v",
    "utm_campaign=c", "&&", "#frag", "#", "%2F", "a b", "\t",
    "?next=/p?utm_source=in-value", "gclid=1", "&fbclid=2", "=",
    ":", "@", "...", "C:\\path", "mailto:x@y", "", "ftp://h/",
    "?utm_source=only", "日本語", "&amp;", "?&&&", "1.2.3.4", "[::1]")

  private def fuzzUrl(): String =
    (0 until (1 + rnd.nextInt(6))).map(_ => fragments(rnd.nextInt(fragments.length))).mkString

  test("normalizeUrl is idempotent and total over 4000 adversarial strings") {
    val urls = Seq.fill(4000)(fuzzUrl()).toDF("u")
    val once = Url.normalizeUrl(col("u"))
    val bad = urls.select(col("u"), once.as("n1"),
        Url.normalizeUrl(once).as("n2"))
      .filter(col("n1").isNull || col("n1") =!= col("n2"))
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("host is total (never null) and itself idempotent as an authority") {
    // host() output re-wrapped into a URL must yield the same host —
    // i.e. host extraction reaches a fixpoint (lowercase, no port, no
    // userinfo left behind)
    val urls = Seq.fill(4000)(fuzzUrl()).toDF("u")
    val h = Url.host(col("u"))
    val bad = urls.select(col("u"), h.as("h1"),
        Url.host(concat(lit("http://"), h, lit("/"))).as("h2"))
      .filter(col("h1").isNull ||
        (length(col("h1")) > 0 && col("h1") =!= col("h2")))
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("registrableDomain is total over fuzzed hosts") {
    val urls = Seq.fill(4000)(fuzzUrl()).toDF("u")
    val n = urls.select(
        Url.registrableDomain(Url.host(col("u"))).as("d"))
      .filter(col("d").isNull).count()
    assert(n === 0)
  }

  test("sniffMime is total and in-vocabulary over random and magic-prefixed bytes") {
    val kinds = Seq("image/png", "image/jpeg", "image/gif",
      "application/pdf", "application/gzip", "application/zip",
      "audio/wav", "video/mp4", "application/warc",
      "application/octet-stream")
    val rows = Seq.tabulate(4000) { i =>
      val len = rnd.nextInt(64)
      val bytes = Array.fill(len)(rnd.nextInt(256).toByte)
      // half the corpus gets a REAL magic prefix followed by garbage —
      // the sniffer must still answer from the prefix alone
      if (i % 2 == 0) bytes
      else {
        val magics = Seq("89504E47", "FFD8FF", "47494638", "25504446",
          "1F8B", "504B0304", "52494646")
        val m = magics(rnd.nextInt(magics.length))
          .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
        m ++ bytes
      }
    }.toDF("b")
    val out = rows.select(Mime.sniffMime(col("b")).as("m"))
      .filter(col("m").isNull || !col("m").isin(kinds: _*)).collect()
    assert(out.isEmpty, out.take(5).mkString("\n"))
  }

  test("robots decisions are total: every (host, path) gets a non-null verdict") {
    val paths = Seq.fill(2000)(fuzzUrl().replaceAll("^[a-zA-Z]+://", "/"))
    val urls = paths.zipWithIndex
      .map { case (p, i) => (s"h${i % 7}", p) }.toDF("host", "path")
    val body = Seq.tabulate(7)(i =>
      (s"h$i", "User-agent: *\nDisallow: /p\nAllow: /p/1\nDisallow: /*.zip$\n"))
      .toDF("host", "txt")
    val out = Robots.decisions(urls, "host", "path",
      Robots.parseRules(body, "host", "txt"), "graftbot")
    // one verdict per DISTINCT (host, path) — the operator's contract
    assert(out.count() === urls.distinct().count())
    assert(out.filter(col("allowed").isNull).count() === 0)
  }
}
