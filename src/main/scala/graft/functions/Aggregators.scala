package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (the `Aggregator[IN, BUF, OUT]` capability —
  * SURVEY §2.12: the reference's closest analog is the mutable HashSet
  * accumulator inside ProductStats' window reduce,
  * rt-flink bean/package.scala:326-333).
  *
  * [[exactDistinct]] is the exactness option for windowed distinct
  * counts where `size(collect_set(...))` materializes the set in the
  * aggregation buffer row and `approx_count_distinct` trades error for
  * memory: the Aggregator's buffer is a serialized long-set that merges
  * map-side, so the shuffle carries one buffer per (group × task).
  * Use when group-local cardinality is bounded (order ids per sku per
  * window); switch to approx at hostile cardinalities — same query
  * shape either way.
  */
object Aggregators {

  private type SetBuf = mutable.HashSet[Long]

  val exactDistinctAgg: Aggregator[Long, SetBuf, Long] =
    new Aggregator[Long, SetBuf, Long] {
      override def zero: SetBuf = mutable.HashSet.empty[Long]
      override def reduce(b: SetBuf, a: Long): SetBuf = { b += a; b }
      override def merge(b1: SetBuf, b2: SetBuf): SetBuf = { b1 ++= b2; b1 }
      override def finish(r: SetBuf): Long = r.size.toLong
      override def bufferEncoder: Encoder[SetBuf] = Encoders.kryo[SetBuf]
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Exact distinct count of a LONG column as an untyped aggregation
    * column, usable in any `df.agg(...)` (`functions.udaf` bridges the
    * typed Aggregator into SQL aggregation).
    */
  def exactDistinct(c: Column): Column =
    org.apache.spark.sql.functions.udaf(exactDistinctAgg)
      .apply(c)
}
