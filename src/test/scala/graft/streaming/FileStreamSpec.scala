package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The flagship B4 hourly series as a Structured Streaming file-source query
  * over the real events fixture — readStream → windowed agg → memory sink,
  * batch/stream parity asserted against the batch answer (the Spark unified
  * model: one plan, two execution modes).
  */
class FileStreamSpec extends SparkSpec {

  test("streaming file source reproduces the batch hourly series") {
    // raw parquet schema (ts = nanos-as-long), not the Tables-normalized one
    val schema = spark.read.parquet(s"$sf001/events.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet") // stream source wants a dir
      .parquet(sf001)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)")) // nanosAsLong
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("converted"))
    val q = stream.writeStream.format("memory").queryName("hourly_files")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()

    val streamed = spark.table("hourly_files")
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val batch = graft.SparkEntry.queries("b04_hourly_series")(spark, sf001)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"stream/batch divergence: ${streamed.size} vs ${batch.size}")
  }
}
