package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("gateReason: null text is rejected, not kept (r10 review regression)") {
    // a when-chain SKIPS null conditions — without the explicit null
    // branch a null document fell through every predicate to "keep"
    val docs = Seq[(Long, String)]((1L, null), (2L, "tiny"))
      .toDF("doc_id", "text")
    val got = docs.select($"doc_id", Quality.gateReason($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "null_text", got.toString)
    assert(got(2L) == "too_short")
  }

  private def signalRows(docs: Seq[(Long, String)],
                         topNs: Seq[Int] = Seq(2, 3), dupN: Int = 5,
                         lineDelim: String = "\n") =
    Quality.repetitionSignals(docs.toDF("doc_id", "text"),
      "doc_id", "text", topNs, dupN, lineDelim)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("repetitionSignals: hand-computed line duplication") {
    // doc 1: lines [x, x, y] -> 3 lines, 2 duplicated (both occurrences
    // count), dup_line_frac = 2/3; line chars 3, dup chars 2.
    // doc 2: one line, nothing duplicated.
    val got = signalRows(Seq((1L, "x\nx\ny"), (2L, "solo line")))
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_lines") == 3L)
    assert(r1.getAs[Long]("dup_line_frac_e6") == 666666L)
    assert(r1.getAs[Long]("dup_line_char_frac_e6") == 666666L)
    val r2 = got(2L)
    assert(r2.getAs[Long]("n_lines") == 1L)
    assert(r2.getAs[Long]("dup_line_frac_e6") == 0L)
  }

  test("repetitionSignals: hand-computed n-gram masses with overlap clamp") {
    // doc 1 = "a a a a" (7 chars): bigram "a a" occurs 3× (overlapping),
    // len 3 -> mass 9 > 7 chars -> clamped to 1e6. trigram "a a a" ×2,
    // len 5 -> mass 10 -> clamped. No 5-gram exists (4 words) -> 0.
    // doc 2 = "x y z w v" (9 chars): every bigram unique, top mass =
    // 1·3 -> (3e6 div 9) = 333333; its single 5-gram occurs once -> dup 0.
    val got = signalRows(Seq((1L, "a a a a"), (2L, "x y z w v")))
    val r1 = got(1L)
    assert(r1.getAs[Long]("top2gram_char_frac_e6") == 1000000L)
    assert(r1.getAs[Long]("top3gram_char_frac_e6") == 1000000L)
    assert(r1.getAs[Long]("dup5gram_char_frac_e6") == 0L)
    val r2 = got(2L)
    assert(r2.getAs[Long]("top2gram_char_frac_e6") == 333333L)
    assert(r2.getAs[Long]("dup5gram_char_frac_e6") == 0L)
  }

  test("repetitionSignals: duplicated 5-gram mass counts every occurrence") {
    // "p q r s t" repeated 3× -> the 5-gram "p q r s t" (len 9) occurs
    // 3 times among overlapping 5-grams; dup mass >= 27 of 29 chars.
    val text = "p q r s t p q r s t p q r s t"
    val got = signalRows(Seq((1L, text)))(1L)
    assert(got.getAs[Long]("dup5gram_char_frac_e6") > 900000L,
      got.toString)
  }

  test("repetitionSignals: null and empty text degrade to zeros, not nulls") {
    val got = signalRows(Seq((1L, null), (2L, "")))
    for (id <- Seq(1L, 2L); i <- 1 until got(id).length)
      assert(!got(id).isNullAt(i) && got(id).getLong(i) == 0L,
        s"doc $id field $i: ${got(id)}")
  }

  test("repetitionGate: first-failing-reason order and keep") {
    val sig = Seq(
      (1L, 400000L, 100000L, 100000L, 100000L), // dup_lines fires first
      (2L, 100000L, 300000L, 300000L, 300000L), // then dup_line_chars
      (3L, 0L, 0L, 250000L, 200000L),           // then top_ngram_mass
      (4L, 0L, 0L, 0L, 200000L),                // then dup_ngram_mass
      (5L, 0L, 0L, 0L, 0L)                      // keep
    ).toDF("doc_id", "dup_line_frac_e6", "dup_line_char_frac_e6",
      "top2gram_char_frac_e6", "dup5gram_char_frac_e6")
    val got = sig.select($"doc_id", Quality.repetitionGate().as("r"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "dup_lines", 2L -> "dup_line_chars",
      3L -> "top_ngram_mass", 4L -> "dup_ngram_mass", 5L -> "keep"))
  }
}
