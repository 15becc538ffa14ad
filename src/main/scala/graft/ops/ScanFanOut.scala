package graft.ops

import org.apache.spark.sql.DataFrame

/** Operator-neutral fan-out switch for narrow explode-heavy chains.
  *
  * A tokenize/shingle pass is a NARROW chain from the scan (explode →
  * map-side partial agg), so the scan's file/split count caps its
  * parallelism — a few-file input serializes the amplified work onto
  * one core. The round-robin repartition here buys full width at the
  * cost of one (id, text) exchange; at real scale the scan already
  * arrives thousands-of-splits wide, so deployments disable it.
  *
  * Config: `graft.fanOutScan` (operator-neutral) wins; the historical
  * `graft.dedup.fanOutScan` is honored as a fallback so existing
  * deployments keep their behavior — but it no longer silently changes
  * the plan shape of NON-dedup operators once the neutral key is set
  * (the r12 advice: a user disabling the dedup fan-out should not
  * surprise-reshape a Quality operator).
  */
object ScanFanOut {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val enabled = spark.conf.getOption("graft.fanOutScan")
      .getOrElse(spark.conf.get("graft.dedup.fanOutScan", "true"))
    if (enabled == "true")
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }
}
