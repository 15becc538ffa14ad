package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("stage() persists, registers with CacheScope, and records its name") {
    CacheScope.release(spark)
    val before = CacheScope.trackedCount(spark)
    val staged = Pipeline.stage("demo",
      spark.range(10).toDF("id").withColumn("x", col("id") * 2))
    assert(staged.storageLevel.useMemory || staged.storageLevel.useDisk,
      "stage() must persist the frame")
    assert(CacheScope.trackedCount(spark) == before + 1,
      "stage() must register with the session CacheScope")
    assert(CacheScope.stagedNames(spark) == Seq("demo"))
    CacheScope.release(spark)
    assert(CacheScope.stagedNames(spark).isEmpty,
      "release must drain the stage-name record")
  }

  test("q145 runs on the stage helper: every boundary persist present by name") {
    // the composed corpus pipeline's 28→11 s behavior exists because of
    // these four stage boundaries (see Pipeline.scala); this pins them
    // so a refactor cannot silently drop one and go combinatorial
    CacheScope.release(spark)
    val out = graft.SparkEntry.queries("q145_corpus_pipeline")(
      spark, "/root/testdata/sf0.001")
    assert(out.count() > 0)
    val names = CacheScope.stagedNames(spark)
    assert(Seq("gate", "scrub", "split", "decontaminate")
        .forall(names.contains),
      s"q145's stage persist points must exist by name, got: $names")
    CacheScope.release(spark)
  }
}
