package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Bridge into Catalyst's codegen'd bloom-probe expression — the same
  * kernel Spark's own runtime row-level filtering injects
  * (`InjectRuntimeFilter`). Lives in the spark.sql namespace because
  * `ExpressionUtils` and the expression are `private[sql]`.
  */
object BloomProbe {

  /** `might_contain(bloomBytes, valueExpr)` where `bloomBytes` is a
    * sketch serialized by `org.apache.spark.util.sketch.BloomFilter
    * .writeTo` (the format `BloomFilterMightContain` deserializes) and
    * `value` must be the SAME hash domain the sketch was populated
    * with (here: xxhash64 longs).
    */
  def mightContainLong(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      ExpressionUtils.expression(value)))
}
