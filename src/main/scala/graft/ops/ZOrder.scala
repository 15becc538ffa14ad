package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimension layout lever.
  *
  * Range-clustering on ONE key ([[Layout.writeClustered]]) gives
  * file-level pruning on that key only; queries filtering the other
  * dimension scan everything. Interleaving the bits of two bucketed
  * keys into one Morton code and range-clustering on THAT bounds every
  * file in a small (a, b) box, so parquet footer min/max prunes files
  * for predicates on EITHER dimension (each at ~sqrt the single-key
  * selectivity) — the standard multi-dim layout in lakehouse engines.
  *
  * The interleave is a pure BIGINT expression: an unrolled Scala-level
  * fold over bit positions (Spark's `shiftleft`/`shiftright` take Int
  * positions, so the loop must unroll at plan-build time — a
  * `sequence()`-driven variant would not compile), codegen-friendly,
  * and replayable in ANSI SQL for the oracle.
  */
object ZOrder {

  /** Morton code of two non-negative bucket columns, `bits` bits each:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .plus(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .plus(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same Morton code as ANSI SQL text (for oracle replay and for
    * engines without the Column API): a sum of masked shifts.
    */
  def zValueSql(a: String, b: String, bits: Int): String = {
    require(bits > 0 && bits <= 31)
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")
  }

  /** Write `df` clustered by the Morton code of two bucketed keys:
    * range-disjoint files in z-space, each covering a small box in
    * (aCol, bCol) — file-level pruning for predicates on either key.
    */
  def writeZClustered(df: DataFrame, path: String, aCol: String, bCol: String,
                      bits: Int, numFiles: Int): Unit = {
    require(numFiles > 0)
    df.withColumn("__z", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
