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

  // ————— streaming k-anonymity suppression (r16) —————

  /** One row bound for the k-anonymity stream: `cell` is the composed
    * quasi-identifier (the caller concatenates its quasi columns — the
    * same composition the batch operator groups by), `ts` the event
    * time the watermark rides on, `id` the passthrough payload.
    */
  case class CellRow(cell: String, ts: java.sql.Timestamp, id: Long)

  // bounded by construction: `buffered` can never exceed k−1 rows (the
  // k-th arrival releases the cohort), and released/closed cohorts
  // carry two booleans — O(k) state per live cohort, O(1) after close
  case class CellState(buffered: Seq[CellRow], released: Boolean,
                       closed: Boolean)

  /** Streaming face of [[graft.ops.Privacy.suppressSmallCells]] under
    * the retroactive-hold doctrine: a cohort's rows are HELD until the
    * cohort reaches `k` rows (then all release unsuppressed,
    * retroactively, and later rows flow), and cohorts still under k
    * when the WATERMARK passes `closeAt` (the release instant) emit
    * their rows with the quasi value replaced by `suppressed` — pooled
    * into the marker cohort exactly as the batch operator does.
    *
    * Batch equivalence (spec-gated): for any input whose rows precede
    * `closeAt`, the set of rows ever emitted equals
    * `Privacy.suppressSmallCells` over the same input, regardless of
    * micro-batch boundaries. AFTER close the operator diverges from a
    * re-run batch on purpose, and conservatively: the suppressed
    * marker was already PUBLISHED for the cohort, so post-close rows
    * emit suppressed too (fail closed — releasing them raw against the
    * published marker would distinguish the cohort after all), and a
    * late flood can never un-suppress a published release. Rows whose
    * event time falls BELOW the watermark never reach the operator at
    * all (Spark's stateful late-data filter drops them) — also a
    * conservative direction: dropped is never released.
    */
  def suppressSmallCellsStream(rows: Dataset[CellRow], k: Int,
                               closeAt: java.sql.Timestamp,
                               watermarkDelay: String = "0 seconds",
                               suppressed: String = "*")(
      implicit spark: SparkSession): Dataset[CellRow] = {
    import spark.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    rows.withWatermark("ts", watermarkDelay)
      .groupByKey(_.cell).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (cell: String, it: Iterator[CellRow], state: GroupState[CellState]) => {
          var st = state.getOption.getOrElse(
            CellState(Vector.empty, released = false, closed = false))
          val out = Vector.newBuilder[CellRow]
          def close(): Unit = {
            st.buffered.foreach(r => out += r.copy(cell = suppressed))
            st = CellState(Vector.empty, released = false, closed = true)
          }
          if (state.hasTimedOut) {
            // watermark passed the release instant: an under-k cohort
            // publishes pooled into the marker (released cohorts keep
            // flowing raw — a stale timeout must not close them)
            if (!st.released) close()
            state.update(st)
          } else {
            val pastClose = state.getCurrentWatermarkMs() >= closeAt.getTime
            it.foreach { r =>
              if (st.released) out += r
              else {
                if (pastClose && !st.closed) close()
                if (st.closed) out += r.copy(cell = suppressed)
                else {
                  val buf = st.buffered :+ r
                  if (buf.size >= k) {
                    buf.foreach(out += _)
                    st = CellState(Vector.empty, released = true, closed = false)
                  } else st = CellState(buf, released = false, closed = false)
                }
              }
            }
            state.update(st)
            // the hold needs a close signal only while the cohort is
            // still undecided (setTimeoutTimestamp must stay above the
            // watermark — undecided here implies closeAt is)
            if (!st.released && !st.closed)
              state.setTimeoutTimestamp(closeAt.getTime)
          }
          out.result().iterator
        })
  }

  /** Row bound for the l-diversity stream: `cell` the composed quasi
    * key, `sens` the sensitive value diversity is counted over.
    */
  case class SensRow(cell: String, sens: String, ts: java.sql.Timestamp,
                     id: Long)

  // distinct sensitive values seen (≤ l−1 — the l-th releases), the
  // held rows (≤ buffer growth until release; unlike the k-gate this
  // is not bounded by l: a cohort can hold many rows of few values),
  // and the two decision booleans
  case class SensState(seen: Seq[String], buffered: Seq[SensRow],
                       released: Boolean, closed: Boolean)

  /** Streaming face of [[graft.ops.Privacy.suppressLowDiversity]] —
    * the l-gate twin of [[suppressSmallCellsStream]]: a cohort's rows
    * HOLD until its sensitive column has shown `l` DISTINCT non-null
    * values (then everything releases unsuppressed and later rows
    * flow), and cohorts still under l diversity when the watermark
    * passes `closeAt` publish POOLED into the marker. Same
    * conservative post-close contract as the k-gate (post-close rows
    * of a published-suppressed cohort emit suppressed; below-watermark
    * rows drop), same batch equivalence (spec-gated across slicings).
    * NULL-equivalent sensitive handling: the batch operator ignores
    * NULL sensitive; callers here encode "no sensitive" by not
    * sending the row, or pre-filter — `sens` is non-null by type.
    *
    * State: ≤ l−1 seen values + the held rows. Unlike the k-gate the
    * buffer is NOT bounded by the threshold (a uniform cohort can
    * hold many rows of one value — exactly the cohorts the gate
    * exists to stop); `maxBuffered` caps it, dropping beyond
    * conservatively (under-release, never a false release).
    */
  def suppressLowDiversityStream(rows: Dataset[SensRow], l: Int,
                                 closeAt: java.sql.Timestamp,
                                 watermarkDelay: String = "0 seconds",
                                 suppressed: String = "*",
                                 maxBuffered: Int = 100000)(
      implicit spark: SparkSession): Dataset[SensRow] = {
    import spark.implicits._
    require(l >= 1, s"l must be >= 1, got $l")
    rows.withWatermark("ts", watermarkDelay)
      .groupByKey(_.cell).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (cell: String, it: Iterator[SensRow], state: GroupState[SensState]) => {
          var st = state.getOption.getOrElse(
            SensState(Vector.empty, Vector.empty, released = false,
              closed = false))
          val out = Vector.newBuilder[SensRow]
          def close(): Unit = {
            st.buffered.foreach(r => out += r.copy(cell = suppressed))
            st = SensState(Vector.empty, Vector.empty, released = false,
              closed = true)
          }
          if (state.hasTimedOut) {
            if (!st.released) close()
            state.update(st)
          } else {
            val pastClose = state.getCurrentWatermarkMs() >= closeAt.getTime
            it.foreach { r =>
              if (st.released) out += r
              else {
                if (pastClose && !st.closed) close()
                if (st.closed) out += r.copy(cell = suppressed)
                else {
                  val seen =
                    if (st.seen.contains(r.sens)) st.seen else st.seen :+ r.sens
                  if (seen.size >= l) {
                    st.buffered.foreach(out += _)
                    out += r
                    st = SensState(Vector.empty, Vector.empty,
                      released = true, closed = false)
                  } else {
                    val buf =
                      if (st.buffered.size < maxBuffered) st.buffered :+ r
                      else st.buffered // conservative drop beyond the cap
                    st = SensState(seen, buf, released = false, closed = false)
                  }
                }
              }
            }
            state.update(st)
            if (!st.released && !st.closed)
              state.setTimeoutTimestamp(closeAt.getTime)
          }
          out.result().iterator
        })
  }

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
