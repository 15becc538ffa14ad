package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of the frequency-threshold release rule
  * ([[graft.ops.Privacy.frequencyThreshold]]): a key's rows are HELD
  * until the key has been seen in `minDocs` DISTINCT documents, then
  * the buffered rows release retroactively and every later row passes
  * straight through — the memorization-mitigation gate applied at
  * ingest time instead of at publish time. Batch-equivalence contract
  * (spec-gated): the set of rows ever emitted equals the batch
  * operator over the same input, regardless of micro-batch boundaries.
  *
  * State per key, two regimes:
  *  - below threshold: the distinct doc-id set (≤ minDocs−1 longs)
  *    plus the buffered rows. The doc set is tiny by construction;
  *    the BUFFER is the unbounded part — at 100 TB a hot key's
  *    buffer is bounded by the threshold being crossed quickly
  *    (exactly the keys with many rows), and a pathological
  *    near-threshold key holds at most its own rows, the same rows a
  *    batch job would also have to hold. Callers with adversarial
  *    inputs cap it with `maxBuffered` — rows beyond the cap DROP
  *    (under-release, never a false release: the gate's failure mode
  *    must be conservative).
  *  - at/above threshold: the buffer is gone; state collapses to the
  *    released flag (the doc set is no longer needed — membership can
  *    only grow). Hot keys therefore carry O(1) state forever.
  */
object ReleaseGate {

  case class KeyedRow(key: String, doc: Long)

  // docs as Seq (distinctness maintained by hand — the state encoder
  // has no codegen support for scala Set; the seq stays < minDocs
  // long) and NOT private: Janino-generated encoder code cannot touch
  // a private nested class (the zero-arg-candidate compile error)
  case class GateState(docs: Seq[Long], buffered: Seq[KeyedRow],
                       released: Boolean)

  /** `minDocs` distinct `doc` values release a `key`; rows of a
    * released key flow, rows of an unreleased key buffer (up to
    * `maxBuffered`, conservatively dropping beyond).
    */
  def frequencyThresholdStream(rows: Dataset[KeyedRow], minDocs: Int,
                               maxBuffered: Int = 100000)(
      implicit spark: SparkSession): Dataset[KeyedRow] = {
    import spark.implicits._
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    rows.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (key: String, it: Iterator[KeyedRow], state: GroupState[GateState]) => {
        var st = state.getOption.getOrElse(
          GateState(Vector.empty, Vector.empty, released = false))
        val out = Vector.newBuilder[KeyedRow]
        it.foreach { r =>
          if (st.released) out += r
          else {
            val docs =
              if (st.docs.contains(r.doc)) st.docs else st.docs :+ r.doc
            if (docs.size >= minDocs) {
              // retroactive release: buffered rows first (arrival
              // order), then the row that crossed the threshold
              st.buffered.foreach(out += _)
              out += r
              st = GateState(Vector.empty, Vector.empty, released = true)
            } else {
              val buf =
                if (st.buffered.size < maxBuffered) st.buffered :+ r
                else st.buffered // conservative drop beyond the cap
              st = GateState(docs, buf, released = false)
            }
          }
        }
        state.update(st)
        out.result().iterator
      })
  }
}
