package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.AhoCorasick

/** Multi-pattern literal scanning as native codegen'd expressions over
  * a compile-time [[graft.functions.AhoCorasick]] automaton. The
  * pattern set is part of the EXPRESSION (a query-constant dictionary,
  * like the blocklist/classifier functions F9/F11): the automaton
  * compiles once on the driver, rides the serialized expression to
  * executors as one reference object, and each row pays a single
  * O(|text|) pass — N patterns never multiply the scan cost and never
  * touch a join or a shuffle.
  *
  * Three faces, one automaton: [[MultiPatternHits]] returns the
  * HIT-SIZED (pattern index, occurrence count) array (the reporting
  * face — which benchmark strings leaked, how often);
  * [[MultiPatternAny]] returns the boolean with first-hit early exit
  * (the gating face — drop the document, don't itemize);
  * [[MultiPatternScrub]] removes every character covered by any
  * occurrence (the redaction face — keep the document, cut the banned
  * spans, mask-union semantics so overlaps compose order-free). All
  * stay inside whole-stage codegen.
  */
case class MultiPatternHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val ac = AhoCorasick.build(patterns)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  // HIT-SIZED output, not dictionary-sized: array of (pattern index,
  // occurrence count) for the patterns that occur. A 10⁴-pattern
  // dictionary against a clean corpus returns empty arrays — the
  // downstream explode is over hits, and row width never scales with N
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PatternExpressions.hits(ac, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.PatternExpressions.hits($acRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MultiPatternScrub(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val ac = AhoCorasick.build(patterns)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PatternExpressions.scrub(ac, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.PatternExpressions.scrub($acRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MultiPatternAny(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val ac = AhoCorasick.build(patterns)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ac.containsAny(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.containsAny($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PatternExpressions {

  /** Static target for the generated code: full counts, then the
    * hit-only (index, count) rows.
    */
  def hits(ac: AhoCorasick, text: UTF8String): ArrayData = {
    val counts = ac.countAll(text.toString)
    var nHit = 0
    var i = 0
    while (i < counts.length) { if (counts(i) > 0L) nHit += 1; i += 1 }
    val rows = new Array[Any](nHit)
    var j = 0
    i = 0
    while (i < counts.length) {
      if (counts(i) > 0L) {
        rows(j) = org.apache.spark.sql.catalyst.InternalRow(i, counts(i))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** Column wrapper: text → array<struct<i,n>> of (pattern index,
    * occurrence count), hit patterns only, ascending index.
    */
  def multiPatternHits(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      MultiPatternHits(ExpressionUtils.expression(text), patterns))

  /** Static target for the generated code: the clean fast path
    * returns the INPUT UTF8String (zero allocation — the NfcNormalize
    * pattern).
    */
  def scrub(ac: AhoCorasick, text: UTF8String): UTF8String = {
    val s = text.toString
    val out = ac.scrub(s)
    if (out eq s) text else UTF8String.fromString(out)
  }

  /** Column wrapper: text → text with every character covered by any
    * pattern occurrence removed (mask-union scrub).
    */
  def multiPatternScrub(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      MultiPatternScrub(ExpressionUtils.expression(text), patterns))

  /** Column wrapper: text → true iff any pattern occurs. */
  def multiPatternAny(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      MultiPatternAny(ExpressionUtils.expression(text), patterns))
}
