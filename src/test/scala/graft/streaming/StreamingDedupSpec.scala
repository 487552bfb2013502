package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming flavor of the exact-dedup operator (x01): duplicates arriving on
  * an unbounded stream are dropped with BOUNDED state via
  * dropDuplicatesWithinWatermark — the state-retention contract that makes
  * streaming dedup viable on an infinite corpus (plain dropDuplicates would
  * grow state forever).
  */
class StreamingDedupSpec extends SparkSpec {

  test("dropDuplicatesWithinWatermark dedups the stream with bounded state") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

    val q = input.toDF().toDF("ts", "fp") // fp = content fingerprint (x14)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()

    // batch 1: doc A twice, doc B once => A's duplicate dropped
    input.addData((ts(10, 0), "docA"), (ts(10, 5), "docA"), (ts(10, 10), "docB"))
    q.processAllAvailable()
    // batch 2: another A inside the watermark window is still a duplicate
    input.addData((ts(10, 30), "docA"), (ts(10, 40), "docC"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_stream").collect()
      .map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length).toMap
    assert(out == Map("docA" -> 1, "docB" -> 1, "docC" -> 1),
      s"each fingerprint exactly once within the watermark: $out")
  }
}
