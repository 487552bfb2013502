package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming as-of enrichment (AsofStream): parity with the batch x203
  * point-in-time join on a replayed fixture stream, the reorder case a
  * join can't show (a view arriving AFTER a purchase but with an earlier
  * event time still enriches it), and exactly-once emission.
  */
class AsofStreamSpec extends SparkSpec {

  test("replayed fixture stream emits exactly the batch x203 rows") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val base = graft.Tables(spark, sf001, "events")
      .where(col("user_id") < 20 && col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
      .orderBy("ts")
      .collect()
      .map(r => AsofStream.Event(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3)))
    assert(base.nonEmpty)
    val input = MemoryStream[AsofStream.Event]
    val q = AsofStream(input.toDS(), watermarkDelaySec = 600)
      .writeStream.format("memory").queryName("asof_replay")
      .outputMode("append").start()
    val chunks = base.grouped(math.max(1, base.length / 3 + 1)).toSeq
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    // far-future sentinel seals every pending event via the watermark
    input.addData(AsofStream.Event(-1L,
      new Timestamp(base.map(_.ts.getTime).max + 10L * 86400 * 1000), -1L, "view"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("asof_replay")
      .where(col("userId") >= 0)
      .collect()
      .map(r => (r.getLong(1),
        Option(r.getTimestamp(3)).map(_.getTime),
        Option(r.get(4)).map(_.toString.toLong))).toSet

    // batch reference = the x203 operator restricted to the same slice
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_p"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val batch = graft.Tables(spark, sf001, "events")
      .where(col("user_id") < 20 && col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"),
        when(col("event_type") === "view", col("ts")).as("view_ts0"))
      .withColumn("view_ts", max(col("view_ts0")).over(w))
      .where(col("is_p") === 1)
      .select(col("event_id"), col("view_ts"),
        (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap"))
      .collect()
      .map(r => (r.getLong(0),
        Option(r.getTimestamp(1)).map(_.getTime),
        Option(r.get(2)).map(_.toString.toLong))).toSet
    assert(got == batch,
      s"missing=${(batch -- got).take(3)} extra=${(got -- batch).take(3)}")
  }

  test("a late-but-admissible view enriches an already-buffered purchase; exactly once") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val input = MemoryStream[AsofStream.Event]
    val q = AsofStream(input.toDS(), watermarkDelaySec = 1800)
      .writeStream.format("memory").queryName("asof_reorder")
      .outputMode("append").start()
    // batch 1: the purchase arrives FIRST (wm -> 10:10 - 30min, nothing seals)
    input.addData(AsofStream.Event(1L, ts(10), 100L, "purchase"))
    q.processAllAvailable()
    // batch 2: a view with an EARLIER event time arrives late but
    // admissible — it must slot in front of the buffered purchase
    input.addData(AsofStream.Event(1L, ts(5), 99L, "view"))
    q.processAllAvailable()
    assert(spark.table("asof_reorder").count() == 0,
      "nothing may emit before the watermark seals the pair")
    // sentinel advances the watermark past both -> the purchase commits
    // WITH the reordered view
    input.addData(AsofStream.Event(2L, ts(59), 101L, "view"))
    q.processAllAvailable()
    val rows = spark.table("asof_reorder").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getTimestamp(3)).map(_.toString)))
    assert(rows.toSeq == Seq((1L, 100L, Some(ts(5).toString))),
      rows.mkString(","))
    // re-processing adds nothing (exactly-once on the committed set)
    input.addData(AsofStream.Event(2L, ts(59), 102L, "view"))
    q.processAllAvailable()
    assert(spark.table("asof_reorder").count() == 1)
    q.stop()
  }
}
