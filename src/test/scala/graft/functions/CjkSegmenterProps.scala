package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

/** Property coverage for the CJK tokenizer kernel — the invariants the
  * fixture spec can't exhaust:
  *  1. LOSSLESS PARTITION: concatenating the emitted tokens of any
  *     whitespace-free chunk reproduces the chunk exactly (FMM never
  *     drops or duplicates a character);
  *  2. WHITESPACE EQUIVALENCE: on CJK-free text the kernel equals the
  *     plain `\s+` split with empties dropped — the contract that keeps
  *     every pre-round-9 tokenization oracle green;
  *  3. NEVER-THROWS on arbitrary BMP strings.
  * Pure JVM (no Spark session).
  */
object CjkSegmenterProps extends Properties("CjkSegmenter") {

  private def toks(s: String): Seq[String] = {
    val arr = CjkSegmenter.tokenize(UTF8String.fromString(s))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  private val cjkChar: Gen[Char] = Gen.choose('一', '龥')
  private val dictWord: Gen[String] = Gen.oneOf(CjkSegmenter.words.toSeq)
  private val latinChunk: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  // chunks mixing dictionary words, random CJK, and latin runs
  private val mixedChunk: Gen[String] = Gen.nonEmptyListOf(Gen.oneOf(
    dictWord, cjkChar.map(_.toString), latinChunk)).map(_.mkString)

  property("tokens partition every whitespace-free chunk losslessly") =
    Prop.forAll(mixedChunk) { chunk =>
      toks(chunk).mkString == chunk
    }

  property("CJK-free text tokenizes exactly as the plain \\s+ split") =
    Prop.forAll(Gen.listOf(Gen.oneOf(latinChunk, Gen.oneOf(" ", "\t", "\n", "  ")))) { parts =>
      val s = parts.mkString
      toks(s) == s.split("\\s+").toSeq.filter(_.nonEmpty)
    }

  property("never throws on arbitrary BMP strings") =
    Prop.forAll(Gen.listOf(Gen.frequency(
      (1, Gen.choose(0x0000.toChar, 0x001F.toChar)),
      (3, cjkChar),
      (3, Gen.choose(0x0020.toChar, 0xD7FF.toChar)))).map(_.mkString)) { s =>
      toks(s); true
    }
}
