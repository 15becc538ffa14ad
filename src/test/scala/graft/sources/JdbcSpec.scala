package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.StreamingPipelines

/** Exercises the JDBC seam for real against embedded Derby — the
  * reference's two most-used integration points: the MySQL config-table
  * read (MySQLUtil.scala:14-61) and the ClickHouse batch sink
  * (ClickHouseUtil.scala:21-53). No external service: Derby runs
  * in-process off /opt/spark/jars.
  */
class JdbcSpec extends SparkSpec {

  private val dbDir = java.nio.file.Files.createTempDirectory("graft_derby").toString
  private val url = s"jdbc:derby:$dbDir/db;create=true"
  private val props = new Properties()

  private def exec(sql: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try { val st = conn.createStatement(); try st.execute(sql) finally st.close() }
    finally conn.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    exec("""CREATE TABLE table_process (
             source_table VARCHAR(64), operate_type VARCHAR(32),
             sink_type VARCHAR(32), sink_table VARCHAR(64),
             sink_columns VARCHAR(256))""")
    exec("INSERT INTO table_process VALUES ('view','insert','kafka','dwd_view','id,uid')")
    exec("INSERT INTO table_process VALUES ('purchase','insert','clickhouse','dws_purchase','id')")
    exec("""CREATE TABLE events_by_id (
             event_id BIGINT, user_id BIGINT, value DOUBLE)""")
    (1L to 100L).foreach(i =>
      exec(s"INSERT INTO events_by_id VALUES ($i, ${i % 7}, ${i * 1.5})"))
  }

  test("S4: spark.read.jdbc reads the config table (the MySQLUtil seam)") {
    val config = Jdbc.readTable(spark, url, "table_process", props)
    assert(config.count() === 2)
    assert(config.columns.map(_.toLowerCase).toSet ===
      Set("source_table", "operate_type", "sink_type", "sink_table", "sink_columns"))
    val kafkaSinks = config.filter(col("sink_type") === "kafka")
      .select("sink_table").collect().map(_.getString(0))
    assert(kafkaSinks.toSeq === Seq("dwd_view"))
  }

  test("S4: readQuery pushes a SQL query down to the database") {
    val q = Jdbc.readQuery(spark, url,
      "SELECT sink_type, COUNT(*) AS n FROM table_process GROUP BY sink_type", props)
    val m = q.collect()
      .map(r => r.getString(0) -> r.getAs[Number](1).longValue()).toMap
    assert(m === Map("kafka" -> 1L, "clickhouse" -> 1L))
  }

  test("S4-scale: partitioned read splits the scan into parallel range queries") {
    val df = Jdbc.readTablePartitioned(spark, url, "events_by_id",
      "event_id", 1L, 100L, 4, props)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100)
    assert(df.agg(sum(col("event_id"))).head().getLong(0) === 5050L)
  }

  test("K3/K10: jdbcSink writes a batch (transient cols dropped) and reads back") {
    import spark.implicits._
    exec("CREATE TABLE dws_out (k VARCHAR(32), total DOUBLE)")
    val batch = Seq(("a", 1.5, "scratch"), ("b", 2.5, "scratch"))
      .toDF("k", "total", "debug_only")
    StreamingPipelines.jdbcSink(url, "dws_out", Seq("debug_only"), props)(batch, 0L)
    val back = Jdbc.readTable(spark, url, "dws_out", props)
    assert(back.columns.map(_.toLowerCase).toSet === Set("k", "total"))
    assert(back.count() === 2)
    assert(back.agg(sum(col("total"))).head().getDouble(0) === 4.0)
  }

  test("K10: executeUpdate runs parameterized update/delete and reports the row count") {
    exec("CREATE TABLE proc_state (source_table VARCHAR(64), done INT)")
    exec("INSERT INTO proc_state VALUES ('view', 0)")
    exec("INSERT INTO proc_state VALUES ('purchase', 0)")
    val n = Jdbc.executeUpdate(url,
      "UPDATE proc_state SET done = ? WHERE source_table = ?", Seq(1, "view"), props)
    assert(n === 1)
    // no match -> 0, and the table is untouched
    assert(Jdbc.executeUpdate(url,
      "UPDATE proc_state SET done = ? WHERE source_table = ?", Seq(1, "absent"), props) === 0)
    val m = Jdbc.readTable(spark, url, "proc_state", props)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m === Map("view" -> 1, "purchase" -> 0))
    assert(Jdbc.executeUpdate(url,
      "DELETE FROM proc_state WHERE done = ?", Seq(1), props) === 1)
    assert(Jdbc.readTable(spark, url, "proc_state", props).count() === 1)
  }

  test("K10: Jdbc.writeTable appends with batchsize and round-trips values") {
    import spark.implicits._
    exec("CREATE TABLE metrics (name VARCHAR(32), v BIGINT)")
    Jdbc.writeTable(Seq(("pv", 10L), ("uv", 3L)).toDF("name", "v"),
      url, "metrics", props, batchSize = 100)
    Jdbc.writeTable(Seq(("pv", 5L)).toDF("name", "v"), url, "metrics", props)
    val m = Jdbc.readQuery(spark, url,
      "SELECT name, SUM(v) AS v FROM metrics GROUP BY name", props)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("pv" -> 15L, "uv" -> 3L))
  }
}
