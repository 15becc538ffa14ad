package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Streaming face of the frequency-threshold release rule
  * ([[graft.ops.Privacy.frequencyThreshold]]): a key's rows are HELD
  * until the key has been seen in `minDocs` DISTINCT documents, then
  * the buffered rows release retroactively and every later row passes
  * straight through — the memorization-mitigation gate applied at
  * ingest time instead of at publish time. Batch-equivalence contract
  * (spec-gated): the set of rows ever emitted equals the batch
  * operator over the same input, regardless of micro-batch boundaries.
  *
  * State per key (keyed by the two-lane xxhash64 FINGERPRINT of the
  * key, r17 — see [[GateState]]), two regimes:
  *  - below threshold: the distinct doc-id set (≤ minDocs−1 longs)
  *    and the buffered rows' doc ids — no text at all. The
  *    doc set is tiny by construction; the BUFFER is the unbounded
  *    part — at 100 TB a hot key's buffer is bounded by the threshold
  *    being crossed quickly (exactly the keys with many rows), and a
  *    pathological near-threshold key holds at most its own rows, the
  *    same rows a batch job would also have to hold. Callers with
  *    adversarial inputs cap it with `maxBuffered` — rows beyond the
  *    cap DROP (under-release, never a false release: the gate's
  *    failure mode must be conservative), surfaced through the drop
  *    counter, never silent.
  *  - at/above threshold: buffer and text are gone; state collapses
  *    to the released flag (the doc set is no longer needed —
  *    membership can only grow). Hot keys therefore carry O(1)
  *    TEXT-FREE state forever: 16 bytes of fingerprint key + a flag.
  */
object ReleaseGate {

  case class KeyedRow(key: String, doc: Long)

  // The frequency gate's state is keyed by the two-lane xxhash64
  // FINGERPRINT of the key, never its text (r17 — the batch gate's
  // Privacy.frequencyThreshold posture applied to the state store):
  // extracted spans/n-grams can be KBs, and a raw-text group key would
  // put corpus text on the shuffle wire AND in every state-store row
  // key. The state value carries NO text at all — buffered rows store
  // only their doc ids (arrival order), and the retroactive release
  // reconstructs them from the LIVE row's key (a release can only be
  // row-driven under NoTimeout, so a live row is always in hand; an
  // earlier draft kept a keyText copy in state "for reconstruction"
  // that nothing read — r17 review dropped it). A hot key's standing
  // state is 16 bytes of key + a boolean; a held key's is its doc-id
  // vectors.
  //
  // Collision posture (same arithmetic as the batch gate): two distinct
  // keys merging requires a simultaneous collision in both independent
  // 64-bit lanes — expected colliding pairs ~ n²/2¹²⁹; a merge's
  // failure direction is a pooled doc count, i.e. toward a FALSE
  // RELEASE, which is exactly why the gate pays the second lane.
  //
  // Fields NOT private: Janino-generated encoder code cannot touch a
  // private nested class (the zero-arg-candidate compile error). docs
  // as Seq — the state encoder has no codegen support for scala Set;
  // the seq stays < minDocs long.
  case class GateState(docs: Seq[Long], bufferedDocs: Seq[Long],
                       released: Boolean, dropped: Long)

  /** The two-lane key fingerprint, replayed exactly as the batch gate
    * computes it (`xxhash64(key)`, `xxhash64('graft.fq.salt', key)`) so
    * the batch and streaming gates agree on which keys merge.
    */
  private[streaming] def keyFingerprint(key: String): (Long, Long) = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val u = UTF8String.fromString(key)
    val salt = UTF8String.fromString("graft.fq.salt")
    (XxHash64Function.hash(u, StringType, 42L),
      XxHash64Function.hash(u, StringType,
        XxHash64Function.hash(salt, StringType, 42L)))
  }

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
  // the two decision booleans, and the count of rows dropped at the
  // buffer cap (surfaced — a capped cohort must not diverge silently)
  case class SensState(seen: Seq[String], buffered: Seq[SensRow],
                       released: Boolean, closed: Boolean, dropped: Long)

  /** Streaming face of [[graft.ops.Privacy.suppressLowDiversity]] —
    * the l-gate twin of [[suppressSmallCellsStream]]: a cohort's rows
    * HOLD until its sensitive column has shown `l` DISTINCT non-null
    * values (then everything releases unsuppressed and later rows
    * flow), and cohorts still under l diversity when the watermark
    * passes `closeAt` publish POOLED into the marker. Same
    * conservative post-close contract as the k-gate (post-close rows
    * of a published-suppressed cohort emit suppressed; below-watermark
    * rows drop), same batch equivalence (spec-gated across slicings).
    * NULL sensitive handling matches the batch operator: a null
    * `sens` (reachable — Datasets built from DataFrames deliver null
    * Strings regardless of the case-class type) never counts toward
    * diversity, but its row still belongs to the cohort and emits
    * with the cohort's verdict. A cohort of nulls plus one real value
    * holds at l=2 — fail closed, never a false release.
    *
    * State: ≤ l−1 seen values + the held rows. Unlike the k-gate the
    * buffer is NOT bounded by the threshold (a uniform cohort can
    * hold many rows of one value — exactly the cohorts the gate
    * exists to stop); `maxBuffered` caps it, dropping beyond
    * conservatively (under-release, never a false release). The
    * batch-equivalence claim above is therefore SCOPED to cohorts
    * whose held rows stay under `maxBuffered`: a capped row can never
    * be emitted, even suppressed, at close (it was never stored, and a
    * pre-decision raw emit would be unsafe) — so drops are surfaced
    * through `droppedCounter` (at-least-once under task retries — an
    * operational signal, not an exact ledger) and a close-time log
    * line, never silent.
    */
  def suppressLowDiversityStream(rows: Dataset[SensRow], l: Int,
                                 closeAt: java.sql.Timestamp,
                                 watermarkDelay: String = "0 seconds",
                                 suppressed: String = "*",
                                 maxBuffered: Int = 100000,
                                 droppedCounter: Option[LongAccumulator] = None)(
      implicit spark: SparkSession): Dataset[SensRow] = {
    import spark.implicits._
    require(l >= 1, s"l must be >= 1, got $l")
    val dropAcc = droppedCounter.getOrElse(
      spark.sparkContext.longAccumulator("graft.releaseGate.ldiv.dropped"))
    rows.withWatermark("ts", watermarkDelay)
      .groupByKey(_.cell).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (cell: String, it: Iterator[SensRow], state: GroupState[SensState]) => {
          var st = state.getOption.getOrElse(
            SensState(Vector.empty, Vector.empty, released = false,
              closed = false, dropped = 0L))
          val out = Vector.newBuilder[SensRow]
          def close(): Unit = {
            st.buffered.foreach(r => out += r.copy(cell = suppressed))
            if (st.dropped > 0L)
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"suppressLowDiversityStream closed cohort '$cell' having " +
                  s"dropped ${st.dropped} rows at the $maxBuffered cap — " +
                  "those rows never emitted (batch divergence, conservative)")
            st = SensState(Vector.empty, Vector.empty, released = false,
              closed = true, dropped = st.dropped)
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
                  // NULL sensitive never counts toward diversity (the
                  // batch operator filters isNotNull before its
                  // distinct — r17 review: counting null made a
                  // 1-real-value cohort release at l=2, a FALSE
                  // release). The row itself still buffers: it
                  // belongs to the cohort and emits with the cohort's
                  // verdict, it just proves nothing.
                  val seen =
                    if (r.sens == null || st.seen.contains(r.sens)) st.seen
                    else st.seen :+ r.sens
                  if (seen.size >= l) {
                    st.buffered.foreach(out += _)
                    out += r
                    st = SensState(Vector.empty, Vector.empty,
                      released = true, closed = false, dropped = st.dropped)
                  } else {
                    val (buf, dropped) =
                      if (st.buffered.size < maxBuffered)
                        (st.buffered :+ r, st.dropped)
                      else { // conservative drop beyond the cap — surfaced
                        dropAcc.add(1L)
                        (st.buffered, st.dropped + 1L)
                      }
                    st = SensState(seen, buf, released = false,
                      closed = false, dropped = dropped)
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
    * `maxBuffered`, conservatively dropping beyond — under-release,
    * never a false release).
    *
    * Grouping and state are keyed by the key's two-lane xxhash64
    * fingerprint ([[keyFingerprint]] — the batch gate's exchange
    * posture applied to the state store): the shuffle wire and the
    * state-store keys carry 16 bytes per key, the text lives ONCE in
    * the held state value and is blanked at release.
    *
    * The batch-equivalence claim (emitted set ≡
    * [[graft.ops.Privacy.frequencyThreshold]] over the same input,
    * any slicing) holds for keys whose held rows stay under
    * `maxBuffered`; beyond it, drops are surfaced through
    * `droppedCounter` (at-least-once under task retries — an
    * operational signal, not an exact ledger) and a log line, so a
    * capped key is never a SILENT divergence.
    */
  def frequencyThresholdStream(rows: Dataset[KeyedRow], minDocs: Int,
                               maxBuffered: Int = 100000,
                               droppedCounter: Option[LongAccumulator] = None)(
      implicit spark: SparkSession): Dataset[KeyedRow] = {
    import spark.implicits._
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val dropAcc = droppedCounter.getOrElse(
      spark.sparkContext.longAccumulator("graft.releaseGate.fq.dropped"))
    rows.groupByKey(r => keyFingerprint(r.key)).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (_: (Long, Long), it: Iterator[KeyedRow], state: GroupState[GateState]) => {
        var st = state.getOption.getOrElse(
          GateState(Vector.empty, Vector.empty, released = false, 0L))
        val out = Vector.newBuilder[KeyedRow]
        it.foreach { r =>
          if (st.released) out += r
          else {
            val docs =
              if (st.docs.contains(r.doc)) st.docs else st.docs :+ r.doc
            if (docs.size >= minDocs) {
              // retroactive release: buffered rows first (arrival
              // order, reconstructed from the single text copy), then
              // the row that crossed the threshold
              st.bufferedDocs.foreach(d => out += KeyedRow(r.key, d))
              out += r
              if (st.dropped > 0L)
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"frequencyThresholdStream released a key that had " +
                    s"dropped ${st.dropped} rows at the $maxBuffered cap " +
                    "— those rows under-released (batch divergence)")
              st = GateState(Vector.empty, Vector.empty,
                released = true, st.dropped)
            } else {
              val (buf, dropped) =
                if (st.bufferedDocs.size < maxBuffered)
                  (st.bufferedDocs :+ r.doc, st.dropped)
                else { // conservative drop beyond the cap — surfaced
                  dropAcc.add(1L)
                  (st.bufferedDocs, st.dropped + 1L)
                }
              st = GateState(docs, buf, released = false, dropped)
            }
          }
        }
        state.update(st)
        out.result().iterator
      })
  }
}
