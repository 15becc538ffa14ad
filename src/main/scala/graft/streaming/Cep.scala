package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A finished or timed-out pattern attempt: `completed` = all steps
  * matched inside the window; otherwise this is the TIMEOUT SIDE
  * OUTPUT (the partial's events, `step` = how many steps had matched)
  * — Flink CEP's `select(timeoutTag){...}` channel, which is the half
  * the reference's bounce pipeline actually consumes
  * (rt-flink UserJumpDetailApp.scala:118-131).
  */
case class PatternMatch[T](key: String, step: Int, completed: Boolean, events: Seq[T])

/** Minimal keyed event for pattern queries over the events table. */
case class CepEvent(key: String, ts: Timestamp, etype: String)

private[streaming] case class CepPartial[T](events: Seq[T], deadlineMs: Long)

/** General sequential-pattern detection over a keyed event stream —
  * the composable form of Flink CEP's `begin(p0).next(p1)...within(t)`
  * (rt-flink UserJumpDetailApp.scala:94-116 is the 2-step instance;
  * [[StatefulOps.bounceDetect]] remains the hand-tuned operator for
  * that exact pattern, with its richer late-event handling).
  *
  * Semantics (the subset of Flink CEP the N-step sequence needs):
  *  - `steps` are per-step predicates; a match attempt STARTS when an
  *    event satisfies `steps.head` and COMPLETES when every step has
  *    matched, in event-time order, within `withinSeconds` of the
  *    first matched event (emitted with `completed = true`).
  *  - one active attempt per key (Flink's skip-till-next-match: no
  *    overlapping attempts; the next attempt can start with the first
  *    qualifying event after the current one resolves).
  *  - `strict = true` is Flink's `next` (strict contiguity): an event
  *    that matches neither the awaited step nor — as a restart —
  *    `steps.head` KILLS the attempt silently, exactly as CEP
  *    discards a strict-contiguity miss. `strict = false` is
  *    `followedBy`: non-matching events are ignored.
  *  - window expiry emits the partial on the timeout side output
  *    (`completed = false`), either when a later event proves the
  *    deadline passed or when the WATERMARK does (event-time timeout —
  *    `events` must carry a watermark on the `tsFn` column, the
  *    bounceDetect contract).
  *
  * Late events that precede the attempt's own progress are not
  * retro-inserted (bounded state cannot reopen consumed steps — the
  * same residual approximation as streaming sessionize; the batch
  * funnel q76 is the exact-replay mirror).
  *
  * Scale shape: identical to every ST operator — one shuffle on the
  * key, per-key state is O(pattern length), state store partitions
  * with the keys (RocksDB-backed on a cluster).
  */
object Cep {

  def sequencePattern[T](events: Dataset[T], keyFn: T => String,
                         tsFn: T => Timestamp,
                         steps: Seq[T => Boolean], withinSeconds: Long,
                         strict: Boolean = true)(
      implicit spark: SparkSession,
      stateEnc: Encoder[CepPartial[T]],
      outEnc: Encoder[PatternMatch[T]]): Dataset[PatternMatch[T]] = {
    require(steps.size >= 2, "a sequence pattern needs at least 2 steps")
    require(withinSeconds > 0, "within window must be positive")
    val withinMs = withinSeconds * 1000
    events.groupByKey(keyFn)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (key: String, it: Iterator[T], state: GroupState[CepPartial[T]]) => {
        if (state.hasTimedOut) {
          val p = state.get
          state.remove()
          Iterator.single(PatternMatch(key, p.events.size, completed = false, p.events))
        } else {
          val sorted = it.toSeq.sortBy(e => tsKey(tsFn(e)))
          val (out, partial) = foldEvents(key, sorted, state.getOption,
            tsFn, steps, withinMs, strict)
          partial match {
            case Some(p) =>
              state.update(p)
              // a timeout at-or-before the watermark throws; clamp to
              // watermark+1 (fires next trigger — the bounceDetect rule)
              state.setTimeoutTimestamp(math.max(
                p.deadlineMs, state.getCurrentWatermarkMs() + 1))
            case None =>
              if (state.exists) state.remove()
          }
          out.iterator
        }
      })
  }

  /** Full-precision ordering key: (epoch ms, nanos-of-second). Event
    * ORDER and the late-event comparison use this, never bare ms —
    * fixtures and oracles carry microsecond timestamps, and two
    * same-key events inside one millisecond would otherwise sort by
    * Spark's arbitrary group-iterator order (run-to-run nondeterminism
    * AND divergence from the microsecond-ordered SQL oracle). Deadline
    * ARITHMETIC stays ms on purpose: `within` is a ms-granular window
    * contract, matching the streaming timeout clock
    * (`setTimeoutTimestamp` is ms).
    */
  @inline private def tsKey(ts: Timestamp): (Long, Int) =
    (ts.getTime, ts.getNanos)

  /** The pattern state machine itself, as a pure per-key fold — ONE
    * definition shared by the streaming operator (per micro-batch,
    * seeded with the carried partial) and [[sequencePatternBatch]]
    * (whole history, no seed). Returns the emitted matches/timeouts
    * and the attempt left open at end-of-input.
    */
  private[streaming] def foldEvents[T](key: String, sorted: Seq[T],
      initial: Option[CepPartial[T]], tsFn: T => Timestamp,
      steps: Seq[T => Boolean], withinMs: Long, strict: Boolean)
      : (Seq[PatternMatch[T]], Option[CepPartial[T]]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[PatternMatch[T]]
    val tupleOrd = implicitly[Ordering[(Long, Int)]]
    var partial = initial
    def tryStart(e: T, t: Long): Unit =
      if (steps.head(e)) {
        partial = Some(CepPartial(Seq(e), t + withinMs))
      }
    for (e <- sorted) {
      val t = tsFn(e).getTime
      partial match {
        case Some(p) if tupleOrd.lt(tsKey(tsFn(e)), tsKey(tsFn(p.events.last))) =>
          () // late, precedes the attempt's progress: documented drop
             // (full-precision compare — a sub-ms-later event is NOT late)
        case Some(p) if t > p.deadlineMs =>
          // window expired before this event: timeout side output,
          // then the event may start the next attempt
          out += PatternMatch(key, p.events.size, completed = false, p.events)
          partial = None
          tryStart(e, t)
        case Some(p) =>
          if (steps(p.events.size)(e)) {
            val evs = p.events :+ e
            if (evs.size == steps.size) {
              out += PatternMatch(key, steps.size, completed = true, evs)
              partial = None
            } else partial = Some(p.copy(events = evs))
          } else if (strict) {
            // strict `next`: a contiguity miss discards the attempt
            // (no timeout output — CEP's discard, not its expiry);
            // the event itself may open the next attempt
            partial = None
            tryStart(e, t)
          } // relaxed `followedBy`: ignore and keep waiting
        case None =>
          tryStart(e, t)
      }
    }
    (out.toSeq, partial)
  }

  /** Batch twin of [[sequencePattern]]: the SAME fold over each key's
    * complete (ts-sorted) history — so an exact SQL oracle can gate
    * the state machine the streaming operator runs. In batch,
    * end-of-data plays the watermark's role: `emitPartials = true`
    * emits the attempt still open at end-of-input as the timeout side
    * output (what the stream would emit when the watermark passes its
    * deadline); mid-history expiries (proven by a later event) emit
    * either way, exactly as in the stream.
    */
  def sequencePatternBatch[T](events: Dataset[T], keyFn: T => String,
                              tsFn: T => Timestamp,
                              steps: Seq[T => Boolean], withinSeconds: Long,
                              strict: Boolean = true,
                              emitPartials: Boolean = false)(
      implicit outEnc: Encoder[PatternMatch[T]]): Dataset[PatternMatch[T]] = {
    require(steps.size >= 2, "a sequence pattern needs at least 2 steps")
    require(withinSeconds > 0, "within window must be positive")
    val withinMs = withinSeconds * 1000
    events.groupByKey(keyFn)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (key: String, it: Iterator[T]) =>
        val sorted = it.toSeq.sortBy(e => tsKey(tsFn(e)))
        val (out, partial) = foldEvents(key, sorted, None, tsFn, steps,
          withinMs, strict)
        val tail = if (emitPartials)
          partial.map(p => PatternMatch(key, p.events.size,
            completed = false, p.events)).toSeq
        else Seq.empty
        (out ++ tail).iterator
      }
  }
}
