package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming flavor of the flagship B4 hourly series: tumbling event-time
  * window + watermark, with late data dropped — the §2.C streaming-windows /
  * watermark rows as a real Structured Streaming query.
  */
class StreamingWindowSpec extends SparkSpec {

  test("tumbling windowed count with watermark drops late events") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

    val q = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour"), col("n"))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()

    // batch 1: hours 10 and 11; completion advances watermark to 10:40
    input.addData((ts(10, 5), "a"), (ts(10, 40), "b"), (ts(11, 10), "c"))
    q.processAllAvailable()
    // batch 2 under watermark 10:40: 10:59 allowed (its window end 11:00 is
    // past the watermark? no — a row is dropped only when its WINDOW END <=
    // watermark; 11:00 > 10:40 keeps it); 09:00's window ended 10:00 <= 10:40
    // => dropped; 13:00 advances the watermark to 12:30, finalizing hours
    // 10 and 11
    input.addData((ts(10, 59), "d"), (ts(9, 0), "late"), (ts(13, 0), "e"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("hourly").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(!out.keys.exists(_.contains("09:")), s"late event must be dropped: $out")
    assert(out("2026-01-01 10:00:00.0") == 3L, s"hour 10 = a,b,d: $out")
    assert(out("2026-01-01 11:00:00.0") == 1L, s"hour 11 = c: $out")
    assert(!out.keys.exists(_.contains("13:")), s"hour 13 not finalized: $out")
  }

  test("stream-stream join: event-time range join with watermarks on both sides") {
    // the attribution shape: clicks join impressions on key within a 1-hour
    // event-time window. Both sides carry watermarks so Spark can bound the
    // join state — the property that makes this viable on unbounded streams.
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

    val impDf = imps.toDF().toDF("impTs", "adId").withWatermark("impTs", "1 hour")
    val clkDf = clicks.toDF().toDF("clkTs", "cAdId").withWatermark("clkTs", "1 hour")
    val q = impDf.join(clkDf,
        col("adId") === col("cAdId") &&
          col("clkTs") >= col("impTs") &&
          col("clkTs") <= col("impTs") + expr("interval 1 hour"))
      .select(col("adId"), col("impTs"), col("clkTs"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()

    imps.addData((ts(10, 0), 1L), (ts(10, 5), 2L))
    clicks.addData(
      (ts(10, 30), 1L), // within 1h of ad 1's impression => joins
      (ts(12, 0), 1L),  // 2h later => outside the range, must not join
      (ts(10, 20), 2L)) // within 1h of ad 2 => joins
    q.processAllAvailable()
    q.stop()

    val out = spark.table("attrib").collect()
      .map(r => (r.getLong(0), r.getTimestamp(2))).toSet
    assert(out == Set((1L, ts(10, 30)), (2L, ts(10, 20))),
      s"exactly the in-window clicks attribute: $out")
  }
}
