package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state — the unbounded-stream form
  * of the batch `session_window` query (c17): per-user gap-based sessions
  * maintained in `flatMapGroupsWithState`, closed and emitted only when
  * the event-time watermark passes the session's gap horizon.
  *
  * Why not `session_window` on the stream? Spark supports it, but the
  * stateful-op form is the one that generalizes: production sessionizers
  * attach per-session payloads (entry page, funnel depth, value sums)
  * the built-in window cannot carry. This operator keeps c17's exact
  * semantics — a session is a maximal event run with inter-event gaps <
  * `gap` — so the batch query doubles as its oracle (the spec pins parity
  * on a replayed fixture stream).
  *
  * Correctness under reordering: state holds the user's UNDISCHARGED
  * session set, an event merges every session it bridges (an arrival
  * inside two sessions' gap envelopes collapses them — the session-merge
  * rule the built-in operator also implements), rows older than the
  * watermark are dropped (the standard late-data contract), and a session
  * is emitted only once the watermark passes `last + gap`, when no
  * admissible event can extend it — so emission order can't lose races
  * against late-but-admissible data.
  *
  * Scale shape: state per active user is the open-session list — almost
  * always length 1, bounded by the number of still-extendable runs inside
  * the watermark horizon, never an event buffer (events fold into
  * (start, last, n) triples). The event-time timeout frees state `gap`
  * past the last event, keeping state proportional to concurrently
  * active users, not history.
  */
object SessionizeStream {

  final case class Event(userId: Long, ts: Timestamp)
  final case class Session(userId: Long, sessionStart: Timestamp,
      sessionEnd: Timestamp, nEvents: Long)

  /** One undischarged session: [start, last] plus the running count. */
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)

  def apply(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    require(gapMs > 0, s"session gap must be positive, got $gapMs")
    val spark = events.sparkSession
    import spark.implicits._
    events
      // milliseconds, NOT s"${gapMs / 1000} seconds": integer division
      // would truncate sub-second gaps to a SHORTER admissibility horizon
      // than the session logic's gap envelope, dropping events the merge
      // rule still considers extendable
      .withWatermark("ts", s"$gapMs milliseconds")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Vector[OpenSession], Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, evs, state) => step(userId, evs, state, gapMs)
      }
  }

  /** Transition shared by the stream and the specs. */
  private[streaming] def step(
      userId: Long,
      evs: Iterator[Event],
      state: GroupState[Vector[OpenSession]],
      gapMs: Long): Iterator[Session] = {
    val wm = if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs() else Long.MinValue
    var sessions = state.getOption.getOrElse(Vector.empty)
    // late-data contract: rows at/before the watermark are dropped, the
    // same admissibility rule the built-in event-time operators apply
    evs.filter(_.ts.getTime > wm).foreach { e =>
      val t = e.ts.getTime
      val (bridged, rest) = sessions.partition(s =>
        t > s.startMs - gapMs && t < s.lastMs + gapMs)
      val merged = bridged.foldLeft(OpenSession(t, t, 1L)) { (acc, s) =>
        OpenSession(math.min(acc.startMs, s.startMs),
          math.max(acc.lastMs, s.lastMs), acc.n + s.n)
      }
      sessions = rest :+ merged
    }
    // discharge: the watermark passed last + gap — no admissible event can
    // extend these, so they are final (emitted exactly once)
    val (closed, open) = sessions.partition(_.lastMs + gapMs <= wm)
    if (open.nonEmpty) {
      state.update(open)
      // earliest horizon strictly above the watermark by the partition
      state.setTimeoutTimestamp(open.map(_.lastMs + gapMs).min)
    } else {
      state.remove()
    }
    closed.sortBy(_.startMs)
      .map(s => Session(userId, new Timestamp(s.startMs),
        new Timestamp(s.lastMs), s.n))
      .iterator
  }
}
