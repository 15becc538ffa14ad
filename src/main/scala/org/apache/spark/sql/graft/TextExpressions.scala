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

object TextExpressions {
  /** Column wrapper: text → array of tokens (whitespace split; CJK runs
    * dictionary-segmented).
    */
  def cjkTokenize(text: Column): Column =
    ExpressionUtils.column(CjkTokenize(ExpressionUtils.expression(text)))
}
