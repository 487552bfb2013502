package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD Type-2 maintenance — the unbounded-stream form of the
  * batch history build (x177, [[graft.queries.Scd.scd2]]): fold a change
  * stream into per-key versioned state and emit each CLOSED validity
  * interval exactly once, as soon as the watermark proves no admissible
  * arrival can reorder before its closing change.
  *
  * The hard part relative to sessionization is ORDER: SCD2 versions are
  * defined by the (ts, event_id) sequence, so an out-of-order arrival
  * inside the watermark horizon must slot into place, not append. The
  * operator is therefore a stateful SORTER + fold: admissible events
  * buffer in state, and only the prefix at or below the watermark is
  * committed (in (ts, event_id) order) — a future arrival must carry
  * ts > watermark, so the committed prefix can never be invalidated.
  * Consecutive-duplicate compression (x177's change semantics) happens
  * at commit time, against the committed current version.
  *
  * Late-data contract: rows at/before the watermark are dropped — the
  * same admissibility rule the built-in event-time operators apply.
  * Emission is exactly-once per closed version: a version closes only
  * when a LATER committed change supersedes it, and commits happen once.
  *
  * Scale shape: state per key = the current open version plus the
  * pending buffer, and the buffer is bounded by the key's arrival rate
  * within one watermark lag — the price of total ordering under
  * reordering, paid in state instead of a per-batch global sort. The
  * open version itself never emits (it is not final); batch x177 over
  * the table of record is the end-of-day reconciliation, and the spec
  * pins stream ≡ batch on the closed set.
  */
object ScdStream {

  final case class Change(userId: Long, ts: Timestamp, eventId: Long,
      attr: String)
  final case class ClosedVersion(userId: Long, attr: String,
      validFrom: Timestamp, validTo: Timestamp, version: Int)

  /** Per-key state: committed open version (if any) + sorted-on-commit
    * pending buffer. `version` numbers versions 1..n in commit order
    * (0 = no version committed yet).
    */
  final case class ScdState(
      openAttr: String, openFromMs: Long, version: Int,
      pending: Vector[(Long, Long, String)]) // (tsMs, eventId, attr)

  def apply(changes: Dataset[Change], watermarkDelaySec: Long): Dataset[ClosedVersion] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .withWatermark("ts", s"$watermarkDelaySec seconds")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[ScdState, ClosedVersion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, evs, state) => step(userId, evs, state)
      }
  }

  /** Transition shared by the stream and the specs. */
  private[streaming] def step(
      userId: Long,
      evs: Iterator[Change],
      state: GroupState[ScdState]): Iterator[ClosedVersion] = {
    val wm = if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs()
      else Long.MinValue
    var st = state.getOption.getOrElse(ScdState(null, 0L, 0, Vector.empty))
    // admit strictly-after-watermark arrivals into the pending buffer
    evs.filter(_.ts.getTime > wm).foreach { e =>
      st = st.copy(pending = st.pending :+ ((e.ts.getTime, e.eventId, e.attr)))
    }
    // commit the <= watermark prefix in (ts, event_id) order — no future
    // arrival can precede it, so the fold below is final
    val (commit, hold) = st.pending.partition(_._1 <= wm)
    val out = Vector.newBuilder[ClosedVersion]
    commit.sortBy(p => (p._1, p._2)).foreach { case (tsMs, _, attr) =>
      if (st.version == 0) {
        st = st.copy(openAttr = attr, openFromMs = tsMs, version = 1)
      } else if (attr != st.openAttr) { // duplicate compression
        out += ClosedVersion(userId, st.openAttr,
          new Timestamp(st.openFromMs), new Timestamp(tsMs), st.version)
        st = st.copy(openAttr = attr, openFromMs = tsMs,
          version = st.version + 1)
      }
    }
    st = st.copy(pending = hold)
    if (st.version == 0 && hold.isEmpty) state.remove()
    else {
      state.update(st)
      // wake when the watermark passes the earliest held row so it commits
      // without needing another arrival for this key
      if (hold.nonEmpty) state.setTimeoutTimestamp(hold.map(_._1).min + 1)
    }
    out.result().iterator
  }
}
