package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CJK-aware tokenization as a native codegen'd expression: whitespace
  * split + FMM dictionary segmentation of CJK runs in ONE call per row
  * ([[graft.functions.CjkSegmenter]] — capability parity with the
  * reference's IK tokenizer, rt-flink KeywordUtil.scala:18-42).
  *
  * A `transform`/`flatten` higher-order composition would evaluate
  * interpreted per element; a UDF would break whole-stage codegen for
  * every downstream text operator (tokenize sits under the simhash,
  * Jaccard, and keyword families' hot paths). The expression's
  * generated code is one static call, same pattern as Spark's own
  * string expressions.
  */
case class CjkTokenize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.CjkSegmenter.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CjkSegmenter.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonical-composition pass every text pipeline runs before hashing
  * or deduplicating (a decomposed "e"+U+0301 and a precomposed "é" are
  * DIFFERENT strings to every fingerprint in this engine; normalizing
  * first is what makes exact dedup mean visual-identity dedup).
  *
  * NFC (not NFKC) deliberately: canonical composition is loss-free and
  * engine-portable — DuckDB's `nfc_normalize` replays it exactly, so
  * the operator sits under the oracle gate. Compatibility folding
  * (NFKC: fullwidth→ASCII, ligature expansion) is lossy and
  * application-specific; layer it separately if a corpus needs it.
  *
  * The already-normalized fast path returns the INPUT UTF8String:
  * real corpora are overwhelmingly NFC already (the sf tables are 100%
  * NFC), so the common case is one `isNormalized` scan with zero
  * allocation beyond the String view.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static target for the generated code (same pattern as
    * [[graft.functions.CjkSegmenter.tokenize]]).
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object TextExpressions {
  /** Column wrapper: text → array of tokens (whitespace split; CJK runs
    * dictionary-segmented).
    */
  def cjkTokenize(text: Column): Column =
    ExpressionUtils.column(CjkTokenize(ExpressionUtils.expression(text)))

  /** Column wrapper: text → NFC-normalized text. */
  def nfcNormalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))
}
