package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-built markup through [[Html]] — each case pins one hazard the
  * regex extractor must survive: script bodies with raw comparison
  * operators, uppercase/multiline tags, entity decode order
  * (&amp;lt; must decode to the TEXT "&lt;", one level only),
  * literal-entity-after-tag-strip semantics, absent title, href
  * counting vs anchor-without-href.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def text1(html: String): String = {
    val df = Seq(html).toDF("h")
    df.select(Html.extractText(col("h"))).as[String].head()
  }

  test("tags strip, whitespace collapses, entities decode") {
    assert(text1("<p>a&nbsp;b</p>\n\t<div> c &amp; d </div>") === "a b c & d")
  }

  test("script/style payloads and comments vanish entirely") {
    val h = "<Script a=1>\nvar t = 1 < 2 && 3 > 2;\n</SCRIPT>x" +
      "<style>p { color: red; }</style>y<!-- secret\nline -->z"
    assert(text1(h) === "xyz")
  }

  test("double-escaped entities decode exactly one level") {
    // &amp;lt; is the TEXT "&lt;" — decoding &amp; last must not turn
    // it into a second decode pass
    assert(text1("<p>&amp;lt;tag&amp;gt;</p>") === "&lt;tag&gt;")
  }

  test("a literal entity-encoded tag stays text, never becomes a tag") {
    assert(text1("<p>&lt;b&gt;not bold&lt;/b&gt;</p>") === "<b>not bold</b>")
  }

  test("title: present, entity-laden, multiline; absent gives empty") {
    val df = Seq(
      ("<html><head><TITLE>\n A &amp; B \n</TITLE></head></html>", 1),
      ("<html><head></head><body>no title</body></html>", 2)
    ).toDF("h", "i")
    val out = df.select(col("i"), Html.extractTitle(col("h")).as("t"))
      .orderBy("i").as[(Int, String)].collect()
    assert(out === Array((1, "A & B"), (2, "")))
  }

  test("link count: href-bearing anchors only; density fixed-point") {
    val h = "<a href=\"x\">1</a><a name=\"no\">2</a>" +
      "<A\n\thref='y'>3</A><p>ten chars!</p>"
    val df = Seq(h).toDF("h")
    val (n, d, len) = df.select(
      Html.countLinks(col("h")).cast("long"),
      Html.linkDensityE6(col("h")),
      length(Html.extractText(col("h"))).cast("long")
    ).as[(Long, Long, Long)].head()
    assert(n === 2L)
    assert(d === math.floor(2L * 100000000.0 / len).toLong)
  }

  test("empty text gives zero density, not a divide-by-zero") {
    val df = Seq("<p></p>").toDF("h")
    assert(df.select(Html.linkDensityE6(col("h"))).as[Long].head() === 0L)
  }

  private def lines(h: String): String =
    Seq(h).toDF("h").select(Html.extractTextLines(col("h"))).as[String].head()

  test("extractTextLines: blocks become lines, inline tags stay in-line") {
    val h = "<html><head><title>T</title></head><body>" +
      "<div>nav | <a href=\"/\">home</a></div>" +
      "<p>one <b>bold</b> para</p><p>two</p></body></html>"
    assert(lines(h) === "T\nnav | home\none bold para\ntwo")
  }

  test("extractTextLines: blank lines drop, edges trim, entities decode") {
    val h = "<body>\n\n<p>  a &amp; b  </p><div></div><br><p>c</p>\n</body>"
    assert(lines(h) === "a & b\nc")
    // script payload never sheds a line
    assert(lines("<body><script>var x=1;\n</script><p>only</p></body>")
      === "only")
  }

  test("extractTextLines: all-markup input gives the empty string") {
    assert(lines("<html><body><div></div></body></html>") === "")
  }
}
