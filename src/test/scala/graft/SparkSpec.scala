package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the test suites: small core count and
  * shuffle partitions (test data is tiny; 32 partitions would just add
  * scheduling overhead), UTC to match the oracle contract.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def beforeAll(): Unit = {
    // cascade-breaker (r12 deflake): a streaming query leaked by an
    // EARLIER suite (e.g. an assert fired between processAllAvailable
    // and q.stop) would keep its ProcessingTime(0) trigger loop running
    // concurrently with THIS suite on the shared session — the one
    // source of cross-suite concurrency in the otherwise-sequential
    // forked test JVM. Stop them before any test runs.
    spark.streams.active.foreach { q =>
      System.err.println(s"[SparkSpec] stopping leaked streaming query ${q.name}")
      q.stop()
    }
  }

  override def afterAll(): Unit = { /* shared session: leave running */ }
}

object SparkSpec {
  // Rebuilt on demand if a suite (HiveCatalogSpec) stopped the shared
  // context to test cross-session catalog persistence. Suites run
  // sequentially in the forked test JVM, so no synchronization races.
  private var current: SparkSession = _

  def session: SparkSession = synchronized {
    if (current == null || current.sparkContext.isStopped) current = build()
    current
  }

  private def build(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
