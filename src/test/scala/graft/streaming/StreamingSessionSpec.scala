package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming sessionization (SessionizeStream): parity with the batch
  * session_window query (c17's semantics) on a replayed fixture stream,
  * plus the stateful-op semantics the built-in can't show structurally —
  * session MERGE on an out-of-order bridging arrival and the late-data
  * drop contract.
  */
class StreamingSessionSpec extends SparkSpec {

  private val GapMs = 30L * 60 * 1000

  test("replayed fixture stream closes exactly the batch session_window sessions") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val base = graft.Tables(spark, sf001, "events")
      .where(col("user_id") < 20)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .orderBy("ts")
      .collect().map(r => SessionizeStream.Event(r.getLong(0), r.getTimestamp(1)))
    assert(base.nonEmpty)
    val input = MemoryStream[SessionizeStream.Event]
    val q = SessionizeStream(input.toDS(), GapMs)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // chronological thirds keep every arrival ahead of the watermark;
    // the far-future sentinel then closes every open session via timeout
    val chunks = base.grouped(math.max(1, base.length / 3 + 1)).toSeq
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    val sentinel = SessionizeStream.Event(-1L,
      new Timestamp(base.map(_.ts.getTime).max + 10L * 86400 * 1000))
    input.addData(sentinel)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions")
      .where(col("userId") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet

    val batch = graft.Tables(spark, sf001, "events")
      .where(col("user_id") < 20)
      .groupBy(col("user_id"),
        session_window(col("ts").cast("timestamp"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0),
        r.getStruct(1).getTimestamp(0).getTime,
        // session_window end = last event + gap; the operator reports the
        // last event itself
        r.getStruct(1).getTimestamp(1).getTime - GapMs,
        r.getLong(2))).toSet
    assert(got == batch,
      s"missing=${(batch -- got).take(3)} extra=${(got -- batch).take(3)}")
  }

  test("a bridging out-of-order arrival merges sessions; sub-watermark rows drop") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    def ts(h: Int, m: Int) = new Timestamp(
      Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00").getTime)
    val input = MemoryStream[SessionizeStream.Event]
    val q = SessionizeStream(input.toDS(), GapMs)
      .writeStream.format("memory").queryName("merge_sessions")
      .outputMode("append").start()
    // batch 1: two runs 30+ min apart -> two open sessions; watermark -> 10:20
    input.addData(SessionizeStream.Event(1L, ts(10, 0)),
      SessionizeStream.Event(1L, ts(10, 50)))
    q.processAllAvailable()
    // batch 2: 10:25 is admissible (> wm 10:20) and bridges both runs ->
    // ONE merged session; 10:10 is at/under the watermark -> dropped
    input.addData(SessionizeStream.Event(1L, ts(10, 25)),
      SessionizeStream.Event(1L, ts(10, 10)))
    q.processAllAvailable()
    // sentinel closes everything
    input.addData(SessionizeStream.Event(2L, ts(20, 0)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("merge_sessions").where(col("userId") === 1L)
      .collect()
      .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(got.toSeq == Seq((ts(10, 0), ts(10, 50), 3L)),
      s"expected one merged 3-event session, got ${got.toSeq}")
  }
}
