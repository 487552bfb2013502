package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming AS-OF enrichment — the unbounded form of the batch
  * point-in-time join (x203): every purchase is enriched with the user's
  * latest view at or before its event time, emitted EXACTLY ONCE, as
  * soon as the watermark proves no admissible view can still slot in
  * front of it.
  *
  * Why neither stream-stream join nor a window works: Spark's interval
  * join emits EVERY view in the tolerance window (asof wants the latest
  * one), and a sort-based window needs the per-key history. The operator
  * is the [[ScdStream]] stateful-sorter discipline specialized to two
  * roles: admissible events buffer per user; when the watermark passes,
  * the committed prefix replays in (ts, side, event_id) order — views
  * before purchases at equal ts, matching the batch operator's inclusive
  * `>=` bound — maintaining ONLY a running latest-view timestamp and
  * emitting each committed purchase with it. Order under reordering is
  * exact: a view that arrives after a purchase but with an earlier event
  * time still enriches it, because neither commits until the watermark
  * passes both.
  *
  * Late-data contract: rows at/before the watermark are dropped (the
  * built-in event-time rule). State per user = one timestamp + the
  * pending buffer, bounded by the user's arrival rate within one
  * watermark lag; the latest-view timestamp persists so an idle user's
  * next purchase still enriches (production TTLs it with the same
  * timeout mechanism when the retention contract allows forgetting).
  * AsofStreamSpec pins stream ≡ batch-x203 semantics on the committed
  * set, exactly-once emission, and the reorder case.
  */
object AsofStream {

  final case class Event(userId: Long, ts: Timestamp, eventId: Long,
      eventType: String)
  final case class Enriched(userId: Long, eventId: Long,
      purchaseTs: Timestamp, viewTs: Option[Timestamp], gapMicros: Option[Long])

  /** Per-user state: micros of the latest COMMITTED view (Long.MinValue =
    * none yet) + the admissible pending buffer (tsMicros, isPurchase,
    * eventId).
    */
  final case class AsofState(lastViewMicros: Long,
      pending: Vector[(Long, Int, Long)])

  private def micros(ts: Timestamp): Long =
    ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def apply(events: Dataset[Event], watermarkDelaySec: Long): Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", s"$watermarkDelaySec seconds")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[AsofState, Enriched](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, evs, state) => step(userId, evs, state)
      }
  }

  /** Transition shared by the stream and the specs. */
  private[streaming] def step(
      userId: Long,
      evs: Iterator[Event],
      state: GroupState[AsofState]): Iterator[Enriched] = {
    val wm = if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs()
      else Long.MinValue
    var st = state.getOption.getOrElse(AsofState(Long.MinValue, Vector.empty))
    // late-data contract: rows at/before the watermark are dropped
    evs.filter(e => e.ts.getTime > wm).foreach { e =>
      val side = e.eventType match {
        case "view" => 0
        case "purchase" => 1
        case _ => -1 // other types carry no asof role
      }
      if (side >= 0)
        st = st.copy(pending = st.pending :+ ((micros(e.ts), side, e.eventId)))
    }
    // commit the prefix the watermark has sealed, in (ts, side, event_id)
    // order — views sort before purchases at equal ts (inclusive >=)
    val (sealed_, open) = st.pending.partition(_._1 / 1000L <= wm)
    val out = Vector.newBuilder[Enriched]
    var lastView = st.lastViewMicros
    sealed_.sorted.foreach { case (us, side, eid) =>
      if (side == 0) lastView = math.max(lastView, us)
      else {
        val v = if (lastView == Long.MinValue) None else Some(lastView)
        out += Enriched(userId, eid, fromMicros(us),
          v.map(fromMicros), v.map(us - _))
      }
    }
    state.update(AsofState(lastView, open))
    if (open.nonEmpty)
      state.setTimeoutTimestamp(math.max(open.map(_._1 / 1000L).min + 1, wm + 1))
    out.result().iterator
  }
}
