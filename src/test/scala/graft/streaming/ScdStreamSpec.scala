package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming SCD2 maintenance (ScdStream): the closed-version stream must
  * equal the batch x177 history's closed rows on a replayed fixture
  * stream — including under WITHIN-BATCH reordering, which exercises the
  * stateful sorter — plus the semantics the parity hash can't show:
  * an out-of-order arrival inside the watermark horizon slots between
  * already-buffered changes, and a sub-watermark arrival drops.
  */
class ScdStreamSpec extends SparkSpec {

  test("replayed fixture stream emits exactly the batch history's closed versions") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val base = graft.Tables(spark, sf001, "events")
      .where(col("user_id") < 20)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
      .orderBy("ts", "event_id")
      .collect()
      .map(r => ScdStream.Change(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3)))
    assert(base.nonEmpty)
    val input = MemoryStream[ScdStream.Change]
    val q = ScdStream(input.toDS(), 60L)
      .writeStream.format("memory").queryName("scd_closed")
      .outputMode("append").start()
    // chronological chunks, each REVERSED before addData — the sorter must
    // reorder them; chunk k's rows are all later than chunk k-1's max, so
    // every arrival stays ahead of the watermark
    base.grouped(math.max(1, base.length / 5 + 1)).foreach { c =>
      input.addData(c.reverse.toSeq); q.processAllAvailable()
    }
    // far-future sentinel: watermark passes every buffered row, committing
    // and closing everything closable
    input.addData(ScdStream.Change(-1L,
      new Timestamp(base.map(_.ts.getTime).max + 10L * 86400 * 1000), 0L, "x"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("scd_closed").where(col("userId") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime,
        r.getTimestamp(3).getTime, r.getInt(4))).toSet

    val batch = graft.queries.Scd.scd2(
        graft.Tables(spark, sf001, "events").where(col("user_id") < 20))
      .where(col("valid_to").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime,
        r.getTimestamp(3).getTime, r.getInt(4))).toSet
    assert(got == batch,
      s"missing=${(batch -- got).take(3)} extra=${(got -- batch).take(3)}")
  }

  test("an admissible out-of-order change slots into order; late rows drop") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    def ts(h: Int, m: Int) = new Timestamp(
      Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00").getTime)
    val input = MemoryStream[ScdStream.Change]
    val q = ScdStream(input.toDS(), 60L) // 1-minute watermark delay
      .writeStream.format("memory").queryName("scd_ooo")
      .outputMode("append").start()
    // batch 1: A@10:00 then C@10:10 arrive; watermark -> 10:09
    input.addData(ScdStream.Change(1L, ts(10, 0), 1L, "A"),
      ScdStream.Change(1L, ts(10, 10), 3L, "C"))
    q.processAllAvailable()
    // A@10:00 committed (<= wm); C@10:10 still buffered
    // batch 2: B@10:09:30 is admissible (> wm) and must slot BETWEEN A and
    // C; A2@10:05 is at/under the watermark -> dropped silently
    input.addData(
      ScdStream.Change(1L, new Timestamp(ts(10, 9).getTime + 30000), 2L, "B"),
      ScdStream.Change(1L, ts(10, 5), 9L, "A2"))
    q.processAllAvailable()
    // sentinel commits and closes everything closable
    input.addData(ScdStream.Change(2L, ts(20, 0), 99L, "Z"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("scd_ooo").where(col("userId") === 1L)
      .collect()
      .map(r => (r.getString(1), r.getTimestamp(2), r.getTimestamp(3),
        r.getInt(4))).sortBy(_._4)
    // history must read A -> B -> C (B slotted in; A2 dropped): closed
    // versions are A@[10:00,10:09:30) v1 and B@[10:09:30,10:10) v2
    assert(got.toSeq == Seq(
      ("A", ts(10, 0), new Timestamp(ts(10, 9).getTime + 30000), 1),
      ("B", new Timestamp(ts(10, 9).getTime + 30000), ts(10, 10), 2)),
      got.toSeq.toString)
  }
}
