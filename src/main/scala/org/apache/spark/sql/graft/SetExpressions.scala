package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** |A ∩ B| over two SORTED `array<bigint>` columns via a codegen'd
  * two-pointer merge.
  *
  * The built-in `size(array_intersect(a, b))` allocates and populates an
  * OpenHashSet per CALL — in the dedup exact-verify stage that call runs
  * once per candidate PAIR, so the hash-set build cost multiplies by the
  * pair count while each set was already aggregated once per document.
  * Sorting each set once per document (`sort_array` after `collect_set`)
  * turns every pair intersection into an allocation-free linear merge,
  * the same per-pair-vs-per-doc cost split as the signature prefilter.
  *
  * Inputs MUST be sorted ascending; the expression does not verify
  * (a precondition documented at the one call site, which always sorts).
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetExpressions {
  /** Column wrapper: intersection count of two sorted array<bigint>
    * columns.
    */
  def intersectCountSorted(a: Column, b: Column): Column =
    ExpressionUtils.column(IntersectCountSorted(
      ExpressionUtils.expression(a.cast("array<bigint>")),
      ExpressionUtils.expression(b.cast("array<bigint>"))))
}
