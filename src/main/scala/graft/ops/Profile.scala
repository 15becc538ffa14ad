package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiling — the data-quality summary every warehouse
  * runs before trusting a new feed (null rates, cardinalities, ranges).
  *
  * Shape: ONE aggregate over the table computes every column's stats as
  * a single wide row (count / nulls / distinct / min / max per column),
  * then a driver-side unpivot (the schema is compile-time known — no
  * data moves) emits one row per column. The scan is single-pass;
  * `exact = true` uses `count_distinct` (Catalyst plans multi-distinct
  * aggregates via Expand — fine at audit scales and for the oracle
  * gate), `exact = false` swaps in `approx_count_distinct` (HLL; the
  * 100 TB default, one pass, no Expand).
  *
  * min/max render through a TYPE-CANONICAL string form so results are
  * engine-portable (and oracle-exact): numerics via DECIMAL(38,6)
  * (fixed six decimals — no float-formatting divergence), timestamps
  * via `yyyy-MM-dd HH:mm:ss`, strings/booleans as-is. Non-atomic
  * columns (arrays, structs, maps, binary) are profiled for counts and
  * nulls only (min/max/distinct are null — ordering them is not
  * meaningful cross-engine).
  */
object Profile {

  private def isAtomic(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def canon(c: Column, dt: DataType): Column = dt match {
    case _: NumericType => c.cast(DecimalType(38, 6)).cast(StringType)
    case TimestampType | TimestampNTZType =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    case DateType => date_format(c, "yyyy-MM-dd")
    case _ => c.cast(StringType)
  }

  def summarize(df: DataFrame, exact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.toSeq
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(count(c).as(s"__nn_${f.name}"))
      if (isAtomic(f.dataType)) {
        val nd =
          if (exact) count_distinct(c) else approx_count_distinct(c)
        // aggregate on the NATIVE type (numeric/temporal order), render
        // canonically afterwards — min of the rendered string would be
        // lexicographic ("10.000000" < "2.500000")
        base ++ Seq(
          nd.as(s"__nd_${f.name}"),
          canon(min(c), f.dataType).as(s"__min_${f.name}"),
          canon(max(c), f.dataType).as(s"__max_${f.name}"))
      } else base
    }
    // ONE job, one wide row; collecting it is schema-sized by
    // definition (the profile IS the model here — same contract as the
    // strata table in Sampling). A lazy per-column union would instead
    // replay the full aggregate once per column.
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val n = row.getLong(row.fieldIndex("__n"))
    def get[T](name: String): Option[T] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.get(i).asInstanceOf[T])
    }
    val out = fields.map { f =>
      val nn = row.getLong(row.fieldIndex(s"__nn_${f.name}"))
      if (isAtomic(f.dataType))
        org.apache.spark.sql.Row(f.name, n, n - nn,
          get[Long](s"__nd_${f.name}").getOrElse(0L),
          get[String](s"__min_${f.name}").orNull,
          get[String](s"__max_${f.name}").orNull)
      else
        org.apache.spark.sql.Row(f.name, n, n - nn, null, null, null)
    }
    val schema = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("n_nulls", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = true),
      StructField("min_value", StringType, nullable = true),
      StructField("max_value", StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
  }
}
