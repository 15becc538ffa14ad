package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped lifecycle for operator-internal persisted state.
  *
  * The dedup/skew family persists intermediates (shingle rows,
  * signature tables, candidate lists, head vocabularies) because
  * multiple plan branches consume them; `connectedComponents` and
  * `trainCentroids` additionally `localCheckpoint` per-round state to
  * truncate lineage. Those blocks outlive the operator call by design —
  * the returned DataFrame is lazy and still reads them — so the
  * operator cannot unpersist them itself. Before round 9 they simply
  * leaked until something swept the whole block manager
  * ([[graft.Bench.releaseAll]]); in a long-lived session (a notebook, a
  * multi-query job) that accumulates without bound.
  *
  * This registry is the explicit lifecycle scope: operators register
  * every persisted frame / checkpoint RDD against their session, and
  * the CALLER calls [[release]] once it has fully consumed the results
  * of the operators it invoked (after the terminal action — the frames
  * are gone afterwards, and localCheckpoint blocks CANNOT be recomputed,
  * so a released frame must not be re-collected).
  *
  * Single-writer assumption: checkpoint tracking diffs the context's
  * persistent-RDD table around the `localCheckpoint` call, so two
  * sessions sharing one SparkContext must not run registered operators
  * concurrently (Verify/Bench/tests are all sequential; a concurrent
  * caller should scope sessions with `spark.newSession()` per thread —
  * the registry is keyed by session).
  */
object CacheScope {

  private val frames =
    new ConcurrentHashMap[SparkSession, java.util.Deque[DataFrame]]()
  private val rdds =
    new ConcurrentHashMap[SparkSession, java.util.Deque[RDD[_]]]()

  private def frameQueue(spark: SparkSession) =
    frames.computeIfAbsent(spark, _ => new java.util.concurrent.ConcurrentLinkedDeque[DataFrame]())
  private def rddQueue(spark: SparkSession) =
    rdds.computeIfAbsent(spark, _ => new java.util.concurrent.ConcurrentLinkedDeque[RDD[_]]())

  /** Persist `df` and register it for the session's next [[release]]. */
  private[graft] def persist(df: DataFrame,
                             level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    frameQueue(df.sparkSession).add(df)
    df
  }

  private val stageNames =
    new ConcurrentHashMap[SparkSession, java.util.Deque[String]]()

  /** [[persist]] plus a stage name recorded for observability — the
    * [[Pipeline.stage]] backing. Names drain with [[release]].
    */
  private[graft] def persistStage(name: String, df: DataFrame,
                                  level: StorageLevel): DataFrame = {
    val out = persist(df, level)
    stageNames.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedDeque[String]()).add(name)
    out
  }

  /** Stage names registered via [[persistStage]] since the last
    * [[release]], in registration order (test/ops observability: a
    * composition spec asserts its persist points exist by name).
    */
  def stagedNames(spark: SparkSession): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Option(stageNames.get(spark)).map(_.asScala.toSeq).getOrElse(Seq.empty)
  }

  /** Eager localCheckpoint returning the checkpointed frame plus the
    * checkpoint's backing RDDs (captured by diffing the persistent-RDD
    * table — the checkpoint RDD is not reachable through the public
    * DataFrame API). Iterative drivers unpersist the PREVIOUS round's
    * RDDs with this handle once the next round is materialized.
    */
  private[graft] def localCheckpointTracked(df: DataFrame): (DataFrame, Seq[RDD[_]]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint(true)
    val added = sc.getPersistentRDDs.collect {
      case (id, r) if !before.contains(id) => r
    }.toSeq
    (out, added)
  }

  /** Register checkpoint RDDs that must survive until [[release]]
    * (e.g. the final round's labels, still read by the returned frame).
    */
  private[graft] def registerRdds(spark: SparkSession, toTrack: Seq[RDD[_]]): Unit = {
    val q = rddQueue(spark)
    toTrack.foreach(q.add)
  }

  /** Drop checkpoint RDDs an iterative driver no longer needs (the
    * previous round's state, once the next round is materialized).
    */
  private[graft] def unpersistRdds(toDrop: Seq[RDD[_]]): Unit =
    toDrop.foreach(_.unpersist(blocking = false))

  /** Release every intermediate registered against `spark` since the
    * last release. Call after the terminal action on the consuming
    * query; results derived from released operators must not be
    * re-executed (checkpoint lineage is truncated by design).
    */
  def release(spark: SparkSession): Unit = {
    Option(frames.remove(spark)).foreach { q =>
      q.forEach(df => { df.unpersist(blocking = false); () })
    }
    Option(rdds.remove(spark)).foreach { q =>
      q.forEach(r => { r.unpersist(blocking = false); () })
    }
    stageNames.remove(spark)
    ()
  }

  /** Number of currently-registered intermediates (test observability). */
  def trackedCount(spark: SparkSession): Int =
    Option(frames.get(spark)).map(_.size).getOrElse(0) +
      Option(rdds.get(spark)).map(_.size).getOrElse(0)

  /** Registry position snapshot for [[releaseSince]]. */
  final case class Mark(nFrames: Int, nRdds: Int)

  /** Snapshot the current registry position. */
  private[graft] def mark(spark: SparkSession): Mark =
    Mark(Option(frames.get(spark)).map(_.size).getOrElse(0),
      Option(rdds.get(spark)).map(_.size).getOrElse(0))

  /** Release ONLY the intermediates registered after `mark` — the
    * per-trigger drain for a streaming sink: without it the registry
    * accretes one batch's worth of DataFrame plan references per
    * trigger for the stream's lifetime (r10 review), but a full
    * [[release]] would also tear down STANDING frames registered at
    * sink creation (a trained model, a bloom sketch). Relies on the
    * documented single-writer assumption: this batch's registrations
    * are exactly the deque's tail.
    */
  private[graft] def releaseSince(spark: SparkSession, m: Mark): Unit = {
    Option(frames.get(spark)).foreach { q =>
      while (q.size > m.nFrames) {
        Option(q.pollLast()).foreach(df => { df.unpersist(blocking = false); () })
      }
    }
    Option(rdds.get(spark)).foreach { q =>
      while (q.size > m.nRdds) {
        Option(q.pollLast()).foreach(r => { r.unpersist(blocking = false); () })
      }
    }
  }

  /** Chainable registered persist: `df.persistTracked()` ≡
    * `CacheScope.persist(df)` — keeps operator pipelines readable.
    */
  private[graft] implicit class TrackedPersist(private val df: DataFrame) extends AnyVal {
    def persistTracked(level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
      CacheScope.persist(df, level)
  }
}
