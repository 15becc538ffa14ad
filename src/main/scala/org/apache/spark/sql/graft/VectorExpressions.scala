package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * Why a custom Catalyst expression instead of
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (interpreted per element —
  * ~100× slowdown in a pair-scoring join) or unpacking dims into scalar
  * columns (the 64-term sum lands in the join condition and blows
  * Janino's whole-stage compile into minutes): this emits ONE tight
  * loop, keeps the surrounding plan codegen small, and evaluates at
  * array-access speed. Composition (cosine = dot/norms) stays in plain
  * Column algebra. Lives under org.apache.spark.sql for private[sql]
  * access to ExpressionUtils/AbstractDataType, the documented seam for
  * Catalyst extensions.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column wrapper: dot product of two array<numeric> columns (cast to
    * array<double> on the way in).
    */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a.cast("array<double>")),
      ExpressionUtils.expression(b.cast("array<double>"))))

  /** Make `dot_product(a, b)` callable from `spark.sql` on an existing
    * session (runtime FunctionRegistry injection; for cluster-wide
    * config use [[GraftExtensions]] via `spark.sql.extensions`).
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => {
        require(exprs.length == 2, "dot_product requires exactly 2 arguments")
        DotProduct(exprs(0), exprs(1))
      },
      "built-in")
}

/** Catalyst extension entry point: `--conf spark.sql.extensions=
  * org.apache.spark.sql.graft.GraftExtensions` registers the engine's
  * custom expressions on every session of the cluster — the documented
  * injection seam for third-party expressions (injectFunction).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "dot_product requires exactly 2 arguments")
        DotProduct(exprs.head, exprs(1))
      }))
  }
}
