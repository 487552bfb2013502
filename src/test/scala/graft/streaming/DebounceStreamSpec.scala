package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** End-to-end Structured Streaming debounce: MemoryStream of size
  * observations → flatMapGroupsWithState → memory sink.
  */
class DebounceStreamSpec extends SparkSpec {
  import DebounceStream._

  test("streaming debounce emits once per run after stability window") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SizeObservation]
    def ts(s: Long) = new Timestamp(s * 1000)
    // runA: grows, then stabilizes; runB: stable from the start
    input.addData(
      SizeObservation("/w/p/runA.d", 100, ts(0)),
      SizeObservation("/w/p/runB.d", 50, ts(0)))
    input.addData(
      SizeObservation("/w/p/runA.d", 200, ts(30)), // runA grew: clock restarts
      SizeObservation("/w/p/runB.d", 50, ts(30)))
    input.addData(
      SizeObservation("/w/p/runA.d", 200, ts(70)), // 40s stable: not yet
      SizeObservation("/w/p/runB.d", 50, ts(70)))  // 70s stable: ready
    input.addData(
      SizeObservation("/w/p/runA.d", 200, ts(95)),  // 65s stable: ready
      SizeObservation("/w/p/runB.d", 50, ts(95)))   // already emitted: silent

    val query = DebounceStream(input.toDS(), quietS = 60)
      .writeStream.format("memory").queryName("debounced")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.awaitTermination(60000)
    query.stop()

    val out = spark.table("debounced").as[ReadyRun].collect()
    assert(out.map(_.path).sorted.toSeq == Seq("/w/p/runA.d", "/w/p/runB.d"))
    assert(out.count(_.path.endsWith("runB.d")) == 1, "emit-once per stable run")
    assert(out.find(_.path.endsWith("runA.d")).get.size == 200)
  }
}
