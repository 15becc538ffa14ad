package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** The single wide aggregate behind [[summarize]] — exposed to the
    * spec because exact/approx is a PLAN property: exact multi-distinct
    * plans through Catalyst's Expand, approx (HLL) must not.
    */
  private[ops] def wideAgg(df: DataFrame, exact: Boolean): DataFrame = {
    val fields = df.schema.fields.toSeq
    // ScanFanOut (r20, guide §2.5): the exact multi-distinct aggregate
    // plans through Expand — every input row is replicated once per
    // distinct column before the partial agg — and the approx path pays
    // one HLL update per column per row. Both are narrow CPU-dense
    // chains from the scan, so a single-file input runs them on one core
    // (measured on q120: one 2.8 s task). Aggregation is
    // partitioning-invariant, so the fan-out exchange changes bytes
    // moved (one table pass), not results.
    val wide = ScanFanOut(df)
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
    wide.agg(aggs.head, aggs.tail: _*)
  }

  def summarize(df: DataFrame, exact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.toSeq
    // ONE job, one wide row; collecting it is schema-sized by
    // definition (the profile IS the model here — same contract as the
    // strata table in Sampling). A lazy per-column union would instead
    // replay the full aggregate once per column.
    val row = wideAgg(df, exact).collect().head
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

  /** Per-group z-score outlier detection — the data-quality gate that
    * flags rows whose value sits more than `zE4/10⁴` sample standard
    * deviations from their GROUP mean (per-event-type, per-priority…).
    *
    * Determinism contract: double `stddev` aggregates are
    * accumulation-ORDER-dependent (central-moment merge order varies
    * per partitioning, and engines differ in algorithm), so z-scores
    * computed from them can flip at floor boundaries. Instead the
    * moments come from EXACT integer sums of `round(value·scale)`:
    * n, S₁ = Σc, S₂ = Σc² as DECIMAL(38,0) — order-independent — and
    * the variance identity n·S₂ − S₁² evaluates exactly in decimals.
    * The only floats are the final sqrt/divide in a fixed operation
    * order, so `z_e4` floors replay bit-for-bit on the oracle
    * (sample variance, n−1; groups with n < 2 or zero variance emit no
    * outliers).
    *
    * One shuffle for the moment table (group-count-sized, broadcast
    * back); the flagging pass is a map-side join + projection.
    */
  def zscoreOutliers(df: DataFrame, idCol: String, valueCol: String,
                     groupCol: String, scale: Long = 100L,
                     zE4: Long = 30000L): DataFrame = {
    val dec = DecimalType(38, 0)
    val c = round(col(valueCol) * scale.toDouble).cast(LongType)
    // NULL values are outside the distribution entirely: they must not
    // inflate n while the sums skip them (a constant group plus one
    // NULL would acquire fake variance — r11 review), and a NULL row
    // can't be an outlier
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(idCol), col(groupCol), c.as("c"))
    val moments = rows.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("c").cast(dec)).as("s1"),
      sum(col("c").cast(dec) * col("c").cast(dec)).as("s2"))
      .filter(col("n") >= 2)
      .withColumn("varnum",
        (col("n").cast(dec) * col("s2") - col("s1") * col("s1")).cast("double"))
      .filter(col("varnum") > 0.0)
      .withColumn("std",
        sqrt(col("varnum") / (col("n").cast("double") * (col("n") - 1).cast("double"))))
    rows.join(broadcast(moments), groupCol)
      .withColumn("z_e4",
        floor(lit(10000.0) *
          ((col("c").cast(dec) * col("n").cast(dec) - col("s1")).cast("double") /
            (col("n").cast("double") * col("std"))))
          .cast("long"))
      .filter(abs(col("z_e4")) >= zE4)
      .select(col(idCol), col(groupCol), col("z_e4"))
  }

  /** Per-group winsorization — clip values to the group's exact
    * rank-based [lo, hi] quantile bounds (the feature-cleaning step
    * before scaling/training; outliers saturate instead of dominating).
    * The bound is the ACTUAL element at 1-based rank ⌈q·n/10⁶⌉
    * (clamped ≥ 1) under (value, id) ordering — [[quantiles]]'s
    * discrete-rank contract per group, so zero float arithmetic picks
    * the bound and the clip chooses one of three input doubles: the
    * whole output replays bit-for-bit on the oracle (`w_e6` =
    * ⌊10⁶·clipped⌋). NULL values are outside the distribution (q125's
    * rule): excluded from ranks and from the output.
    *
    * One shuffle: the rank and count windows share the group
    * partitioning, the bound rows are filtered BEFORE the tiny
    * per-group aggregate, and the bounds table broadcasts back. The
    * sort unit is one group — for ONE giant group use [[quantiles]]'s
    * range-exchange selection for the two bounds and broadcast them,
    * the same dial as perplexityBuckets' threshold-table variant.
    */
  def winsorize(df: DataFrame, idCol: String, valueCol: String,
                groupCol: String, loE6: Long = 50000L,
                hiE6: Long = 950000L): DataFrame = {
    require(loE6 >= 0 && hiE6 <= 1000000L && loE6 < hiE6,
      "need 0 <= loE6 < hiE6 <= 1000000")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"), col(idCol))
    val cw = Window.partitionBy(col(groupCol))
    val ranked = df.filter(col(valueCol).isNotNull)
      .select(col(idCol), col(groupCol), col(valueCol).as("__v"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(cw))
    def target(q: Long) =
      greatest(lit(1L), expr(s"(${q}L * __n + 999999L) div 1000000L"))
    val bounds = ranked
      .filter(col("__rn") === target(loE6) || col("__rn") === target(hiE6))
      .groupBy(col(groupCol)).agg(
        min(when(col("__rn") === target(loE6), col("__v"))).as("__lo"),
        max(when(col("__rn") === target(hiE6), col("__v"))).as("__hi"))
    ranked.join(broadcast(bounds), Seq(groupCol))
      .withColumn("w_e6",
        floor(least(greatest(col("__v"), col("__lo")), col("__hi")) * 1000000.0)
          .cast("long"))
      .select(col(idCol), col(groupCol), col("w_e6"))
  }

  /** Per-group Pearson correlation and OLS slope between two numeric
    * columns — drift/leakage analysis ("does feature x still track
    * label y in this slice?") with [[zscoreOutliers]]'s exactness
    * doctrine extended to the bivariate moments: built-in `corr` /
    * `regr_slope` aggregate central moments whose merge order varies
    * with partitioning, so their last-ulp output is not
    * engine-replayable. Here the six raw moments (n, Σx, Σy, Σx²,
    * Σy², Σxy over `round(value·scale)` integers) are exact
    * DECIMAL(38,0) sums — order-independent — the covariance/variance
    * identities n·Σxy − ΣxΣy evaluate exactly in decimals, and only
    * the final sqrt/divide runs in floats with a FIXED operation
    * order, so `corr_e4`/`slope_e6` floors replay bit-for-bit on a
    * HUGEINT oracle.
    *
    * One shuffle (six map-side-combined sums); output is
    * group-count-sized. Rows with a NULL in either column are outside
    * the joint distribution and excluded from n and all sums (q125's
    * null rule). Groups with n < 2 or zero variance in either column
    * emit nothing (correlation undefined). 38-digit headroom: with
    * e4 scaling, ΣxΣy stays in range through ~10¹² rows per group at
    * |value| ≤ 10⁵ — past that, lower `scale` (the q125 dial).
    */
  def correlation(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String, scale: Long = 10000L): DataFrame = {
    val dec = DecimalType(38, 0)
    val cx = round(col(xCol) * scale.toDouble).cast(LongType)
    val cy = round(col(yCol) * scale.toDouble).cast(LongType)
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol), cx.as("cx"), cy.as("cy"))
    rows.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("cx").cast(dec)).as("sx"),
      sum(col("cy").cast(dec)).as("sy"),
      sum(col("cx").cast(dec) * col("cx").cast(dec)).as("sxx"),
      sum(col("cy").cast(dec) * col("cy").cast(dec)).as("syy"),
      sum(col("cx").cast(dec) * col("cy").cast(dec)).as("sxy"))
      .filter(col("n") >= 2)
      .withColumn("covnum",
        (col("n").cast(dec) * col("sxy") - col("sx") * col("sy")).cast("double"))
      .withColumn("varx",
        (col("n").cast(dec) * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("vary",
        (col("n").cast(dec) * col("syy") - col("sy") * col("sy")).cast("double"))
      .filter(col("varx") > 0.0 && col("vary") > 0.0)
      .withColumn("corr_e4",
        floor(lit(10000.0) *
          (col("covnum") / (sqrt(col("varx")) * sqrt(col("vary")))))
          .cast("long"))
      .withColumn("slope_e6",
        floor(lit(1000000.0) * (col("covnum") / col("varx"))).cast("long"))
      .select(col(groupCol), col("n"), col("corr_e4"), col("slope_e6"))
  }

  /** Equi-width histogram of a numeric column over a CALLER-FIXED
    * [lo, hi) range — the profiling companion to [[summarize]].
    *
    * The range is a parameter, not a data-derived min/max, for two
    * reasons: it makes the histogram ONE pass (no pre-scan), and it
    * makes bucket boundaries stable across runs/partitions of a growing
    * table (the dashboard property). Bucketing is pure integer-ish
    * column algebra on (value - lo) / width — no window, no join; the
    * aggregate shuffles at most `nBins + 2` rows per partition.
    *
    * Output: (bin, lo_edge, hi_edge, n) with underflow bin -1 and
    * overflow bin `nBins` (edges NULL for both); empty bins are
    * emitted with n = 0 via a broadcast-joined bin spine so consumers
    * can plot without gap-filling.
    */
  def histogram(df: DataFrame, valueCol: String,
                lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"need hi > lo and nBins > 0")
    val spark = df.sparkSession
    val width = (hi - lo) / nBins
    val v = col(valueCol).cast(DoubleType)
    val bin = when(v.isNull, lit(null).cast(IntegerType))
      .when(v < lo, lit(-1))
      .when(v >= hi, lit(nBins))
      .otherwise(floor((v - lo) / width).cast(IntegerType))
    val counts = df.select(bin.as("bin")).filter(col("bin").isNotNull)
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val spine = spark.range(-1, nBins + 1)
      .select(col("id").cast(IntegerType).as("bin"))
    spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        when(col("bin") >= 0 && col("bin") < nBins,
          lit(lo) + col("bin") * width).as("lo_edge"),
        when(col("bin") >= 0 && col("bin") < nBins,
          lit(lo) + (col("bin") + 1) * width).as("hi_edge"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** EXACT quantiles per column — distributed rank selection, not a
    * global sort to one partition and not an interpolation.
    *
    * Contract (engine-portable, zero float arithmetic in the
    * selection): the `q_e6` quantile of a column with n non-null
    * values is the value at 1-based ascending rank
    * `clamp(⌈q_e6·n / 10⁶⌉, 1, n)` — integer ceil, an ACTUAL data
    * value (discrete quantile). Interpolating definitions mix engine
    * IEEE op orders; a picked element cannot diverge. Values render
    * through the same type-canonical strings as [[summarize]].
    *
    * Shape, per column:
    *  1. `repartitionByRange` the single-column projection — Spark's
    *     sampled range exchange, the same machinery a global orderBy
    *     uses, but stopping at PARTITIONED order;
    *  2. per-partition counts (one tiny agg) collected driver-side —
    *     partition-count-sized, the strata-table contract — give each
    *     partition its exclusive global rank offset AND n (no separate
    *     count pass);
    *  3. only partitions that actually hold a target rank are rescanned
    *     (partition pruning via the broadcast pid set): a per-partition
    *     `row_number` window (partitionBy pid — never a global window)
    *     plus the offset picks the values map-side.
    * Equal values always land in one range partition (partitioning is a
    * pure function of the value vs the sampled boundaries), and rank
    * ties can only sit on equal values, so the picked value is
    * deterministic even though boundary sampling is not.
    *
    * `exact = false` is the 100 TB single-pass path: one
    * `percentile_approx` aggregate for every column at once (t-digest
    * style sketch, `accuracy` trades error for memory) — same output
    * schema, not oracle-gated (sketch internals are engine-specific),
    * same doctrine as [[summarize]]'s HLL flag.
    */
  def quantiles(df: DataFrame, cols: Seq[String],
                qE6: Seq[Long] = Seq(250000L, 500000L, 750000L,
                  900000L, 990000L),
                exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(qE6.nonEmpty && qE6.forall(q => q > 0 && q <= 1000000L),
      "q_e6 must be in (0, 1000000]")
    val spark = df.sparkSession
    val fields = cols.map(c => df.schema(c))
    require(fields.forall(f => isAtomic(f.dataType)),
      "quantiles need atomic (orderable) columns")
    if (!exact) {
      // one pass, every column: percentile_approx on the native type,
      // canon-rendered INSIDE the aggregate (array of strings), one
      // wide row collected (schema-sized)
      val qsArr = array(qE6.map(q => lit(q.toDouble / 1e6)): _*)
      def qa(f: StructField): Column =
        transform(percentile_approx(col(f.name), qsArr, lit(accuracy)),
          e => canon(e, f.dataType)).as(s"__q_${f.name}")
      val row = df.agg(qa(fields.head), fields.tail.map(qa): _*)
        .collect().head
      val out = fields.flatMap { f =>
        val i = row.fieldIndex(s"__q_${f.name}")
        val vals: Seq[String] =
          if (row.isNullAt(i)) Seq.fill(qE6.size)(null)
          else row.getSeq[String](i)
        qE6.zip(vals).map { case (q, v) =>
          org.apache.spark.sql.Row(f.name, q, v)
        }
      }
      return spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1), quantileSchema)
    }
    val perCol = fields.map { f =>
      val vals = df.select(col(f.name).as("__v"))
        .filter(col("__v").isNotNull)
      val ranged = CacheScope.persist(
        vals.repartitionByRange(col("__v"))
          .withColumn("__pid", spark_partition_id()))
      // partition-count-sized: offsets + n in one driver round trip
      val pc = ranged.groupBy(col("__pid"))
        .agg(count(lit(1)).as("__c"))
        .orderBy(col("__pid")).collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      val n = pc.map(_._2).sum
      val result: DataFrame =
        if (n == 0L) {
          val out = qE6.map(q =>
            org.apache.spark.sql.Row(f.name, q, null))
          spark.createDataFrame(
            spark.sparkContext.parallelize(out, 1), quantileSchema)
        } else {
          // integer ceil: no doubles anywhere near the rank
          val targets = qE6.map(q =>
            q -> math.min(n, math.max(1L, (q * n + 999999L) / 1000000L)))
          val rankSet = targets.map(_._2).toSet
          val offsets = pc.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
            (pid, acc + c)
          }.tail.zip(pc).map { case ((pid, cum), (_, c)) =>
            (pid, cum - c, c)
          } // (pid, exclusiveBefore, count)
          val needed = offsets.filter { case (_, before, c) =>
            rankSet.exists(r => r > before && r <= before + c)
          }
          val offMap = typedLit(needed.map { case (pid, before, _) =>
            pid -> before
          }.toMap)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("__pid")).orderBy(col("__v"))
          val picked = ranged
            .filter(col("__pid").isin(needed.map(_._1): _*))
            .withColumn("__rank",
              offMap(col("__pid")) + row_number().over(w))
            .filter(col("__rank").isin(rankSet.toSeq: _*))
            .select(col("__rank"), canon(col("__v"), f.dataType).as("__s"))
            .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
          val out = targets.map { case (q, r) =>
            org.apache.spark.sql.Row(f.name, q, picked.getOrElse(r, null))
          }
          spark.createDataFrame(
            spark.sparkContext.parallelize(out, 1), quantileSchema)
        }
      ranged.unpersist(blocking = false)
      result
    }
    perCol.reduce(_ unionByName _)
  }

  private val quantileSchema = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("q_e6", LongType, nullable = false),
    StructField("value", StringType, nullable = true)))
}
