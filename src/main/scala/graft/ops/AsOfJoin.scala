package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: match each left row to the LATEST right row with
  * `rightTs <= leftTs` on the same key — the feature-store / market-data
  * lookup Spark has no built-in operator for (the reference approximates
  * it with bounded interval joins, e.g. the payment⋈order [-30 min, 0]
  * pattern in rt-flink PaymentWideAp; an as-of join is the unbounded
  * exact form).
  *
  * Implementation is the scale-correct UNION + SORT + CARRY-FORWARD
  * shape, not join-then-rank:
  *
  *  - Tag both sides, union, and window per key ordered by (ts, side)
  *    with right rows sorting BEFORE left rows at equal ts (inclusive
  *    match). `last(ignoreNulls)` carries each right row's payload —
  *    packed into ONE struct, so all carried columns provably come from
  *    the same right row even when individual payload fields are NULL —
  *    forward to every following left row; left rows then filter back
  *    out with the payload attached.
  *  - Cost: ONE shuffle of |L| + |R| rows on the key and one
  *    within-partition sort — exactly a sort-merge join's exchange
  *    profile. The naive equi-join + `ts_r <= ts_l` + row_number
  *    formulation materializes every (left, earlier-right) candidate
  *    pair first — quadratic per key on dense right sides (a market
  *    feed with 10^6 ticks per key makes that 10^12 pair rows; this
  *    shape stays at 2×10^6).
  *  - Skew: one hot key still lands in one task (same as any windowed
  *    op); the documented escape is range-bucketing the ts into the
  *    key for approximate-horizon as-of joins.
  *
  * Right-side ties (several right rows at the same key+ts) are broken
  * deterministically toward the greatest payload tuple before the
  * union, so output never depends on shuffle order.
  *
  * Contract: `payloadCols` must not collide with left column names;
  * left rows with no preceding right row get NULL payload (left-outer
  * as-of semantics).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTs: String, rightTs: String,
           payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && payloadCols.nonEmpty)
    val leftCols = left.columns.toSeq
    require(payloadCols.forall(!leftCols.contains(_)),
      "payloadCols must not collide with left columns")
    // deterministic right-side tie-break at equal (key, ts): greatest
    // payload tuple wins, mirroring DimStore's no-ordCol contract
    val tieW = Window.partitionBy((keyCols :+ rightTs).map(col): _*)
      .orderBy(payloadCols.map(col(_).desc): _*)
    val lStruct = struct(leftCols.map(col): _*)
    val lType = left.select(lStruct.as("__l")).schema("__l").dataType
    val pStruct = struct(payloadCols.map(col): _*)
    val pType = right.select(pStruct.as("__p")).schema("__p").dataType
    val tsType = left.schema(leftTs).dataType
    val r = right
      .withColumn("__tie", row_number().over(tieW))
      .filter(col("__tie") === 1)
      .select(keyCols.map(col) ++ Seq(
        col(rightTs).cast(tsType).as("__ts"), lit(0).as("__side"),
        pStruct.as("__p"), lit(null).cast(lType).as("__l")): _*)
    val l = left.select(keyCols.map(col) ++ Seq(
      col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(pType).as("__p"), lStruct.as("__l")): _*)
    // right rows sort before left rows at equal ts => inclusive rightTs <= leftTs
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__pc", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.`$c`").as(c)) ++
        payloadCols.map(c => col(s"__pc.`$c`").as(c)): _*)
  }
}
