package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4/K3/K10 — JDBC integration: config-table reads and batch writes.
  *
  * The reference hand-rolls a connection pool + reflection row mapper
  * for its MySQL config reads (rt-flink SRC/utils/mysql/MySQLUtil
  * .scala:14-61) and a batched PreparedStatement writer for ClickHouse
  * (SRC/utils/clickhouse/ClickHouseUtil.scala:21-53). Spark-first both
  * collapse into the built-in JDBC data source, which already does
  * connection pooling per partition, type mapping, and batched
  * inserts (`batchsize`), and — unlike the reference — can parallelize
  * a large table scan across executors via partitioned reads.
  */
object Jdbc {

  /** Read a whole table. For small config/dim tables: lands on the
    * driver side as one partition, intended for immediate
    * `broadcast()` into a join (the disposition SURVEY §2.1 picks for
    * the reference's dim lookups).
    */
  def readTable(spark: SparkSession, url: String, table: String,
                props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Read one SQL query's result (the reference's
    * `MySQLUtil.queryList(sql)` shape) — pushed down wholesale to the
    * database as a derived table.
    */
  def readQuery(spark: SparkSession, url: String, sql: String,
                props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, s"($sql) AS q", props)

  /** Partitioned read — the 100 TB form: `numPartitions` concurrent
    * range scans on `partitionColumn`, one per executor task, instead
    * of a single-connection full scan. Bounds are WHERE-clause
    * endpoints (rows outside still land in the edge partitions).
    */
  def readTablePartitioned(spark: SparkSession, url: String, table: String,
                           partitionColumn: String, lowerBound: Long,
                           upperBound: Long, numPartitions: Int,
                           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  /** K10 — generic batch write (append). `batchsize` controls rows per
    * INSERT round trip, the knob the reference's hand-batched writer
    * exposes as its loop stride.
    */
  def writeTable(df: DataFrame, url: String, table: String,
                 props: Properties = new Properties(),
                 batchSize: Int = 5000): Unit = {
    val p = new Properties()
    p.putAll(props)
    p.setProperty("batchsize", batchSize.toString)
    df.write.mode("append").jdbc(url, table, p)
  }

  /** K10 — generic parameterized UPDATE/DELETE/DDL, driver-side (the
    * reference's `OperatorOnSqlServer.executeUpdate`:
    * SRC/utils/sqlserver/OperatorOnSqlServer.java:55-72 — a
    * PreparedStatement with positional params, returning whether any
    * row changed). Distinct from [[writeTable]] on purpose: control-
    * plane statements (marking a config row processed, truncating a
    * staging table) are single-connection one-shots, not distributed
    * writes — routing them through the Spark writer would serialize a
    * job for one row. Returns the update count.
    */
  def executeUpdate(url: String, sql: String, params: Seq[Any] = Nil,
                    props: Properties = new Properties()): Int = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val ps = conn.prepareStatement(sql)
      try {
        params.zipWithIndex.foreach { case (p, i) =>
          ps.setObject(i + 1, p.asInstanceOf[AnyRef])
        }
        ps.executeUpdate()
      } finally ps.close()
    } finally conn.close()
  }
}
