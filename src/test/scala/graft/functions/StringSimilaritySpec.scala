package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{JaroWinkler, StringSimilarity}
import org.apache.spark.unsafe.types.UTF8String

class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches DuckDB's jaro_winkler_similarity bit-for-bit on the pinned battery") {
    // expected doubles captured from DuckDB v-current on 2026-08-13;
    // any drift here breaks the q118 oracle contract
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("prefixmatch", "prefixnomatch") == 0.9692307692307692)
    assert(jw("aaaaaaaaaaab", "aaaaaaaaaaba") == 0.9833333333333333)
  }

  test("NON-ASCII matches DuckDB byte-for-byte (r11 advice: UTF-8 alphabet, not UTF-16)") {
    // expected doubles captured from DuckDB on 2026-08-14 — these pin
    // the BYTE-level contract: 'é' vs 'e' is C3A9 vs 65 (no shared
    // symbol → 0.0), and the CJK pair differs in ONE byte of nine
    assert(jw("héllo", "hello") == 0.8400000000000001)
    assert(jw("é", "e") == 0.0)
    assert(jw("éa", "ea") == 0.0)
    assert(jw("日本語", "日本誤") == 0.9555555555555556)
    assert(jw("abcé", "abce") == 0.8483333333333334)
    assert(jw("ñandú", "nandu") == 0.6761904761904761)
    assert(jw("Aß", "AB") == 0.611111111111111)
  }

  test("boost threshold is strict: jaro <= 0.7 gets NO prefix bonus") {
    assert(jw("abcx", "abdz") == 0.6666666666666666) // jaro exactly 2/3, prefix 2
    assert(jw("aaaaa", "aabbb") == 0.6)
  }

  test("empty-string convention follows DuckDB: either empty (including both) is 0") {
    assert(jw("", "") == 0.0)
    assert(jw("ab", "") == 0.0)
    assert(jw("", "ab") == 0.0)
  }

  test("identity, zero-match, and window-excluded transposition") {
    assert(jw("abc", "abc") == 1.0)
    assert(jw("xy", "yx") == 0.0) // window 0: adjacent swap can't match
    assert(jw("abc", "xyz") == 0.0)
  }

  test("the SQL registration exposes the native expression by name") {
    graft.functions.SqlFunctions.registerAll(spark)
    val got = spark.sql("SELECT graft_jaro_winkler('martha', 'marhta') AS jw")
      .collect().head.getDouble(0)
    assert(got == 0.9611111111111111)
  }

  test("the Column wrapper codegens and nulls propagate") {
    val df = Seq(("martha", "marhta"), (null, "x")).toDF("a", "b")
    val got = df.select(StringSimilarity.jaroWinkler(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 0.9611111111111111)
    assert(got(1).isNullAt(0))
  }
}
