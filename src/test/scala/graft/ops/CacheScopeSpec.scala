package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 lifecycle gate: every operator-internal persist/checkpoint
  * must be registered, and CacheScope.release alone (no block-manager
  * sweep) must leave ZERO persisted RDDs behind — the leak-by-default
  * blemish from the r8 verdict.
  */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 60L).map { i =>
    val base = s"some shared text body number ${i % 20} with a few more words"
    (i, if (i % 3 == 0) base else base + s" tail $i", "en", 60L)
  }.toDF("doc_id", "text", "lang", "n_chars")

  private def vecs = (0L until 40L).map { i =>
    (i, Array.tabulate(8)(d => ((i * 7 + d * 13) % 17).toFloat / 17f), i % 4)
  }.toDF("vec_id", "embedding", "label")

  test("the dedup/skew/similarity family leaves zero persisted RDDs after release") {
    val sc = spark.sparkContext
    // make sure we start clean (other suites share the session)
    graft.Bench.releaseAll(spark)
    assert(sc.getPersistentRDDs.isEmpty)

    // operators that persist intermediates and/or localCheckpoint
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 4, k = 16, bands = 4, threshold = 0.5)
    pairs.count()
    Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text",
      Seq(col("lang")), 5000L).count()
    Dedup.sharedWindowPairs(docs, "doc_id", "text", k = 20, stride = 4).count()
    Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8,
      partialScreen = true).count()
    Dedup.dedupByPairsScored(docs, "doc_id", "n_chars", pairs).count()
    Skew.headTailJoin(
      docs.select(col("doc_id"), col("lang")),
      docs.groupBy(col("lang")).agg(count(lit(1)).as("hot")),
      "lang", col("hot"), topK = 2).count()
    Similarity.trainCentroids(vecs, nCells = 4, iters = 2).count()

    assert(CacheScope.trackedCount(spark) > 0,
      "operators must register their intermediates")
    CacheScope.release(spark)
    assert(CacheScope.trackedCount(spark) == 0)
    assert(sc.getPersistentRDDs.isEmpty,
      s"leaked RDDs: ${sc.getPersistentRDDs.values.map(_.name).mkString(", ")}")
  }

  test("connectedComponents drops per-round checkpoints inside the loop") {
    graft.Bench.releaseAll(spark)
    // a 12-node path graph needs several label-propagation rounds —
    // without in-loop release each round leaks one checkpoint
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(chain)
    assert(labels.agg(countDistinct(col("label"))).head().getLong(0) == 1L)
    // only the FINAL round's labels (backing the returned frame) remain
    val live = spark.sparkContext.getPersistentRDDs
    assert(live.size <= 2, s"per-round checkpoints leaked: ${live.size} RDDs live")
    CacheScope.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("released checkpoint state is registered per session") {
    graft.Bench.releaseAll(spark)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    CacheScope.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("releaseSince drains only the tail registered after the mark (streaming scope)") {
    graft.Bench.releaseAll(spark)
    // standing frame (a trained model, a bloom sketch) registered at
    // sink creation — a per-trigger drain must not touch it
    val standing = CacheScope.persist(spark.range(0, 5).toDF("id"))
    standing.count()
    val m = CacheScope.mark(spark)
    val batchFrame = CacheScope.persist(spark.range(5, 9).toDF("id"))
    batchFrame.count()
    assert(CacheScope.trackedCount(spark) == 2)
    CacheScope.releaseSince(spark, m)
    assert(CacheScope.trackedCount(spark) == 1, "only the tail drains")
    assert(standing.storageLevel.useMemory, "standing frame must stay cached")
    assert(!batchFrame.storageLevel.useMemory, "batch frame must be released")
    CacheScope.release(spark)
  }
}
