package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("t")

  test("tokenize drops empty tokens from repeated separators") {
    val toks = one("  hello   world  ").select(TextFunctions.tokenize($"t"))
      .as[Seq[String]].head()
    assert(toks == Seq("hello", "world"))
  }

  test("tokenize segments CJK runs by dictionary longest-match (IK fixture shape)") {
    // the reference's own fixture shape (rt-flink KeywordUtil: "Apple手机")
    def toks(s: String): Seq[String] = Seq(s).toDF("t")
      .select(TextFunctions.tokenize(col("t"))).as[Seq[String]].head()
    assert(toks("Apple手机") == Seq("Apple", "手机"))
    // longest match beats the 2-char prefixes (平板电脑 over 平板+电脑)
    assert(toks("三星平板电脑保护套") == Seq("三星", "平板电脑", "保护套"))
    // out-of-vocabulary CJK falls back to single-char tokens
    assert(toks("数据线两条装") == Seq("数据线", "两", "条", "装"))
    // mixed chunk: latin run + CJK run + whitespace chunking
    assert(toks("华为手机充电器 fast delivery") ==
      Seq("华为", "手机", "充电器", "fast", "delivery"))
    // non-CJK text tokenizes exactly as the plain \s+ split did
    assert(toks("  a  b\tc ") == Seq("a", "b", "c"))
  }

  test("FMM adversarial dictionary boundaries: ties, truncated words, OOV runs (r11 verdict ask #8)") {
    // every expectation below is HAND-DERIVED from the FMM rule
    // (longest dictionary match at the current position wins; no
    // backtracking) against the compile-time lexicon — the q100-oracle
    // discipline applied to the segmenter's hardest boundaries
    def toks(s: String): Seq[String] = Seq(s).toDF("t")
      .select(TextFunctions.tokenize(col("t"))).as[Seq[String]].head()
    // (1) overlapping longest-match tie: 运动鞋 (3) beats 运动 (2) even
    // though that strands 子 — greedy FMM does NOT re-segment to
    // [运动, 鞋子]; this asymmetry is the documented FMM contract
    assert(toks("运动鞋子") == Seq("运动鞋", "子"))
    // (2) nested prefixes three deep: 蓝牙耳机 (4) over 蓝牙 (2) + 耳机 (2)
    assert(toks("蓝牙耳机套装") == Seq("蓝牙耳机", "套装"))
    // (3) a dictionary word TRUNCATED at the run end falls back to
    // single chars: 充电 is only a prefix (充电器/充电宝), not a word
    assert(toks("充电") == Seq("充", "电"))
    // (4) OOV char splitting two dictionary words: 的 is not in the
    // lexicon and must surface as its own single-char token
    assert(toks("手机的价格") == Seq("手机", "的", "价格"))
    // (5) an entirely-OOV CJK run: every char is its own token
    assert(toks("之乎者也") == Seq("之", "乎", "者", "也"))
    // (6) greedy consumes the longest word STARTING at the position,
    // not the globally-best cover: 智能手表 (4) wins over 智能 + 手表
    assert(toks("智能手表带") == Seq("智能手表", "带"))
    // (7) ASCII run interleaved mid-CJK splits the runs; segmentation
    // restarts cleanly after the interruption
    assert(toks("小米note手机壳") == Seq("小米", "note", "手机壳"))
    // (8) word straddling an ASCII interruption must NOT match: 手 and
    // 机 land in different runs around "x", so 手机 cannot form
    assert(toks("手x机") == Seq("手", "x", "机"))
  }

  test("tokenCount counts non-empty tokens") {
    val n = one("a b  c").select(TextFunctions.tokenCount($"t")).as[Int].head()
    assert(n == 3)
  }

  test("removeEmoji strips non-text codepoints but keeps letters/punct/space") {
    val out = one("hi 😀 there!").select(TextFunctions.removeEmoji($"t"))
      .as[String].head()
    assert(out == "hi  there!")
  }

  test("shingles produces distinct n-grams of the normalized text") {
    val sh = one("abcd").select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head()
    assert(sh.toSet == Set("abc", "bcd"))
  }

  test("wordNgrams forms sliding joined n-grams") {
    val g = one("a b c d").select(
      TextFunctions.wordNgrams(TextFunctions.tokenize($"t"), 2)).as[Seq[String]].head()
    assert(g == Seq("a b", "b c", "c d"))
  }

  test("langId picks the language with the highest marker ratio") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "le chat et la maison de paris"),
      (3L, "der hund und die katze"),
      (4L, "xyzzy qwerty")
    ).toDF("id", "t")
    val out = df.select($"id", TextFunctions.langId($"t")).as[(Long, String)]
      .collect().toMap
    assert(out == Map(1L -> "en", 2L -> "fr", 3L -> "de", 4L -> "und"))
  }

  test("dictClassify emits labels in dictionary order, 'none' when empty") {
    val dicts = Seq("perf" -> Seq("fast"), "compute" -> Seq("join", "sort"))
    val df = Seq((1L, "a fast sort"), (2L, "nothing here")).toDF("id", "t")
    val out = df.select($"id", TextFunctions.dictClassify($"t", dicts))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "perf,compute", 2L -> "none"))
  }

  test("rollingFingerprint is the polynomial hash of token lengths") {
    // tokens "ab","c" → ((0*31+2)%M)*31+1 = 63
    val fp = one("ab c").select(TextFunctions.rollingFingerprint($"t")).as[Long].head()
    assert(fp == 63L)
  }

  test("contentFingerprint is whitespace/case insensitive") {
    val df = Seq(("A  b\tC"), ("a b c")).toDF("t")
      .select(TextFunctions.contentFingerprint($"t")).as[Long].collect()
    assert(df(0) == df(1))
  }

  test("quality ratios: stopword ratio and mean token length, floored e4") {
    // "the cat" → 1 stopword / 2 tokens = 0.5 → 5000
    val s = one("the cat").select(TextFunctions.qualityStopwordRatio($"t")).as[Long].head()
    assert(s == 5000L)
    // mean token len of "ab cd" = 2.0 → 20000
    val m = one("ab cd").select(TextFunctions.meanTokenLen($"t")).as[Long].head()
    assert(m == 20000L)
  }

  test("nfcNormalize composes combining marks, passes NFC through, keeps NFKC out of scope") {
    def norm(t: String): String =
      one(t).select(TextFunctions.nfcNormalize($"t")).as[String].head()
    // canonical composition: e+U+0301 -> é, A+U+030A -> Å, o+U+0308 -> ö
    assert(norm("Café") == "Café")
    assert(norm("Ångström") == "Ångström")
    // already-NFC (incl. CJK and a lone combining mark) is unchanged
    for (s <- Seq("plain ascii", "café", "中文 text", "́", ""))
      assert(norm(s) == s)
    // NFC, not NFKC: fullwidth/compatibility chars must NOT fold
    assert(norm("ｅｘ") == "ｅｘ")
    // idempotent, and null propagates
    assert(norm(norm("Café")) == "Café")
    val n = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(TextFunctions.nfcNormalize($"t")).collect()
    assert(n(0).isNullAt(0))
    // matches java.text.Normalizer on arbitrary mark-heavy strings
    val mixed = "x́̂ ỹz̄ é́"
    assert(norm(mixed) ==
      java.text.Normalizer.normalize(mixed, java.text.Normalizer.Form.NFC))
  }

  test("redactPii replaces every email, IPv4, and phone occurrence") {
    def red(t: String): String =
      one(t).select(TextFunctions.redactPii($"t")).as[String].head()
    assert(red("mail a.b+c@x-y.co and d@e.org now") == "mail <EMAIL> and <EMAIL> now")
    assert(red("host 192.168.0.1 or 10.0.0.255.") == "host <IP> or <IP>.")
    assert(red("call 555-867-5309 / 021.1234.5678") == "call <PHONE> / <PHONE>")
    // email wins over the phone/IP patterns inside an address
    assert(red("x 555.867.5309@example.com y") == "x <EMAIL> y")
    // \b keeps longer digit runs from being half-matched as an IP
    assert(red("build 1234.5.6.7890 stays") == "build 1234.5.6.7890 stays")
    assert(red("no pii here") == "no pii here")
  }
}
