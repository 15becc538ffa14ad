package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.SparkSpec

/** Fixture-drift guard for the central table loader.
  *
  * The driver regenerates /root/testdata between rounds, and the
  * generator has shipped `events.ts` both as parquet TIMESTAMP(NANOS)
  * (which Spark reads as a long under `nanosAsLong`) and as
  * TIMESTAMP(MICROS) (Spark-native). Round 10's loader assumed the nanos
  * flavor unconditionally and the micros regeneration broke every
  * events-table query at the driver's gate. These tests pin the contract:
  * `Tables.load` yields a proper TimestampType `ts` from EITHER flavor.
  */
class TablesSpec extends SparkSpec {

  private def writeAndLoad(writeTs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("tables-spec").toFile
    dir.deleteOnExit()
    writeTs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    Tables.load(spark, dir.getAbsolutePath, "events")
  }

  test("events.ts as native micros timestamp passes through unchanged") {
    import spark.implicits._
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-03-01 12:00:00"), 7L))
      .toDF("event_id", "ts", "user_id")
    val loaded = writeAndLoad(df)
    assert(loaded.schema("ts").dataType == TimestampType)
    val got = loaded.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss")).as[String].head()
    assert(got == "2024-03-01 12:00:00")
  }

  test("events.ts as TIMESTAMP_NTZ (isAdjustedToUTC=false, the r10+ fixture flavor) normalizes to LTZ") {
    import spark.implicits._
    val df = Seq((1L, "2024-03-01 12:00:00", 7L)).toDF("event_id", "ts", "user_id")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val loaded = writeAndLoad(df)
    assert(loaded.schema("ts").dataType == TimestampType)
    // strict-LTZ functions must accept it (q45's unix_millis was the r10 casualty)
    val millis = loaded.select(expr("unix_millis(ts)")).as[Long].head()
    assert(millis == 1709294400000L)
  }

  test("events.ts as long nanos (the nanosAsLong read shape) converts to micros") {
    import spark.implicits._
    // 2024-03-01 12:00:00 UTC in nanoseconds since epoch — exactly what a
    // TIMESTAMP(NANOS) column reads as under the nanosAsLong flag.
    val nanos = 1709294400L * 1000000000L
    val df = Seq((1L, nanos, 7L)).toDF("event_id", "ts", "user_id")
    assert(df.schema("ts").dataType == LongType)
    val loaded = writeAndLoad(df)
    assert(loaded.schema("ts").dataType == TimestampType)
    val got = loaded.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss")).as[String].head()
    assert(got == "2024-03-01 12:00:00")
  }

  test("driver fixture column names match the contract every query is written against") {
    // drift alarm: the generator regenerates /root/testdata between
    // rounds — a renamed/added/dropped column should fail HERE, loudly,
    // not as dozens of AnalysisExceptions at the driver's gate
    val expected = Map(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    for ((t, cols) <- expected) {
      val got = Tables.load(spark, "/root/testdata/sf0.001", t).schema.fieldNames.toSeq
      assert(got == cols, s"fixture drift in table $t: got $got, queries expect $cols")
    }
  }

  test("the driver fixture itself loads with a TimestampType ts in a sane range") {
    val loaded = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    val years = loaded.select(min(year(col("ts"))), max(year(col("ts")))).head()
    assert(years.getInt(0) >= 2000 && years.getInt(1) <= 2100,
      s"events.ts out of sane range: $years — fixture schema drifted?")
  }
}
