package graft.sources

import graft.ops.Bucketing
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S7: Hive-metastore catalog — the property under test is PERSISTENCE:
  * a bucketed table written by one session must be visible to a brand-new
  * session (fresh SparkContext, fresh SharedState) connecting to the same
  * metastore, and must still join exchange-free there. The in-memory
  * catalog cannot pass this test — its tables die with the session —
  * which is exactly why the reference reads its DM layer from Hive
  * (rt-flink `$01_FlinkWithHive.scala:28-40`).
  *
  * This suite manages its own SparkSessions (the shared test session has
  * catalogImplementation=in-memory, fixed at SharedState creation), so it
  * stops whatever session is live, runs two sequential Hive sessions
  * against one Derby metastore, and leaves the context stopped —
  * graft.SparkSpec rebuilds on demand for later suites.
  */
class HiveCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val base = Files.createTempDirectory("graft-hive").toFile.getAbsolutePath
  private val wh = s"$base/warehouse"
  private val ms = s"$base/metastore_db"

  override def beforeAll(): Unit = {
    SparkSession.getDefaultSession.orElse(SparkSession.getActiveSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  override def afterAll(): Unit = {
    // leave no live Hive session behind: SparkSpec.session rebuilds the
    // plain in-memory-catalog session for whatever suite runs next
    SparkSession.getDefaultSession.orElse(SparkSession.getActiveSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("bucketed table written in session A survives into a NEW session and joins exchange-free") {
    // --- session A: write two co-bucketed tables into the Hive catalog
    val a = HiveCatalog.session(wh, ms)
    try {
      assert(a.conf.get("spark.sql.catalogImplementation") == "hive")
      import a.implicits._
      val facts = (1L to 2000L).map(i => (i % 500, s"f$i")).toDF("k", "fv")
      val dims = (0L until 500L).map(i => (i, i * 10.0)).toDF("k", "dv")
      Bucketing.writeBucketed(facts, "hive_facts", Seq("k"), 4, sortCols = Seq("k"))
      Bucketing.writeBucketed(dims, "hive_dims", Seq("k"), 4, sortCols = Seq("k"))
      assert(HiveCatalog.tableExists(a, "hive_facts"))
    } finally a.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // --- session B: fresh context + SharedState, same metastore
    val b = HiveCatalog.session(wh, ms)
    try {
      assert(HiveCatalog.tableExists(b, "hive_facts"),
        "table written by session A must be visible to session B via the metastore")
      assert(HiveCatalog.tableExists(b, "hive_dims"))
      b.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = HiveCatalog.readTable(b, "hive_facts")
        .join(HiveCatalog.readTable(b, "hive_dims"), "k")
      assert(joined.count() == 2000L)
      assert(Bucketing.isExchangeFree(joined),
        s"metastore-persisted bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
      Bucketing.dropTable(b, "hive_facts")
      Bucketing.dropTable(b, "hive_dims")
    } finally b.stop()
  }
}
