package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.Quiescence

/** Streaming debounce — operator A9 as a Structured Streaming stateful op
  * (SURVEY.md §7.4.1, hard part #1): Spark has no built-in debounce, so the
  * quiescence state machine runs in flatMapGroupsWithState keyed by run path.
  *
  * Input: a stream of SizeObservation(path, size, ts) — produced by any
  * source that snapshots directory sizes (the poller, a file-event feed, a
  * CDC stream). Output: one ReadyRun per path, emitted the first time its
  * size has been stable for `quietS` seconds. A processing-time timeout
  * fires even when no new observation arrives, so "writer stopped mid-write
  * and went silent" still becomes ready once the window elapses — matching
  * the reference's blocking wait_for_quiet (dags/msconvert_dag.py:92-100)
  * without blocking an executor.
  */
object DebounceStream {

  final case class SizeObservation(path: String, size: Long, ts: Timestamp)
  final case class ReadyRun(path: String, size: Long, readyAt: Timestamp)

  /** Internal per-key state: last size + when it was first seen + emitted. */
  final case class DebounceState(lastSize: Long, stableSinceMs: Long, emitted: Boolean)

  /** @param wallClockTimeout live mode (default): a processing-time timeout
    *   re-checks stability even when the observation source goes silent, so
    *   "writer stopped mid-write and never wrote again" still becomes ready
    *   after the window. Pass false for replay/backfill over historical
    *   observations, where wall-clock timers would fire spuriously — then
    *   readiness advances on event time only.
    */
  def apply(
      observations: Dataset[SizeObservation],
      quietS: Int,
      wallClockTimeout: Boolean = true): Dataset[ReadyRun] = {
    val spark = observations.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (wallClockTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    observations
      .groupByKey(_.path)
      .flatMapGroupsWithState[DebounceState, ReadyRun](
        OutputMode.Append(), timeoutConf) {
        (path, obs, state) => step(path, obs, state, quietS, wallClockTimeout)
      }
  }

  /** The transition, shared by the real stream and the specs. Uses the pure
    * Quiescence.advance for the size/clock logic; adds emit-once bookkeeping
    * and the timeout re-check.
    */
  private[streaming] def step(
      path: String,
      obs: Iterator[SizeObservation],
      state: GroupState[DebounceState],
      quietS: Int,
      wallClockTimeout: Boolean = true): Iterator[ReadyRun] = {
    val nowMs = state.getCurrentProcessingTimeMs()

    if (obs.isEmpty && state.hasTimedOut) {
      // no new observations: the size is by definition unchanged; re-check
      // the clock against wall time
      state.getOption match {
        case Some(s) if !s.emitted && nowMs - s.stableSinceMs >= quietS * 1000L =>
          state.update(s.copy(emitted = true))
          return Iterator(ReadyRun(path, s.lastSize, new Timestamp(nowMs)))
        case Some(s) if !s.emitted =>
          state.setTimeoutDuration(quietS * 1000L - (nowMs - s.stableSinceMs))
          return Iterator.empty
        case _ => return Iterator.empty
      }
    }

    var cur = state.getOption
    val out = Seq.newBuilder[ReadyRun]
    obs.toSeq.sortBy(_.ts.getTime).foreach { o =>
      val prev = cur.map(s => Quiescence.QuietState(s.lastSize, s.stableSinceMs / 1000L))
      val d = Quiescence.advance(prev, o.size, o.ts.getTime / 1000L, quietS)
      val emittedBefore = cur.exists(_.emitted) && cur.exists(_.lastSize == o.size)
      if (d.ready && !emittedBefore) {
        out += ReadyRun(path, o.size, new Timestamp(nowMs))
        cur = Some(DebounceState(d.state.lastSize, d.state.stableSinceEpochS * 1000L, emitted = true))
      } else if (d.ready) {
        cur = Some(DebounceState(d.state.lastSize, d.state.stableSinceEpochS * 1000L, emitted = true))
      } else {
        cur = Some(DebounceState(d.state.lastSize, d.state.stableSinceEpochS * 1000L, emitted = false))
      }
    }
    cur.foreach { s =>
      state.update(s)
      if (!s.emitted && wallClockTimeout) state.setTimeoutDuration(quietS * 1000L)
    }
    out.result().iterator
  }
}
