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
    // raw parquet schema (not the Tables-normalized one): ts arrives as
    // nanos-as-long or TIMESTAMP_NTZ depending on the fixture generation —
    // normalize exactly as Tables does
    val schema = spark.read.parquet(s"$sf001/events.parquet").schema
    val raw = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet") // stream source wants a dir
      .parquet(sf001)
    val normalized =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw.withColumn("ts", col("ts").cast("timestamp"))
    val stream = normalized
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

  test("streaming exact-dedup reproduces batch x01 (unified-model parity)") {
    // the training-data dedup aggregate run as a stream over the same
    // corpus: groupBy(text) -> (min keeper, count) in complete mode must
    // equal the batch x01 answer row for row
    val schema = spark.read.parquet(s"$sf001/documents.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sf001)
      .groupBy(col("text"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
      .select(col("keeper"), col("n_copies"))
    val q = stream.writeStream.format("memory").queryName("dedup_files")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()

    val streamed = spark.table("dedup_files")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.SparkEntry.queries("x01_dedup_exact")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"stream/batch dedup divergence: ${streamed.size} vs ${batch.size}")
  }

  test("maxFilesPerTrigger bounds per-batch intake (the MAX_MAP analog)") {
    // the reference caps each cycle at MAX_MAP runs (A8); the streaming file
    // source expresses the same backpressure as maxFilesPerTrigger: with 6
    // files and a 2-file cap, AvailableNow must drain in 3 bounded batches
    // and still process every row exactly once
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ratelimit")
    val dir = s"$root/input"
    for (i <- 0 until 6) // 6 appends of 1 row => 6 flat part files
      Seq((i.toLong, s"run_$i")).toDF("id", "name")
        .coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes.synchronized { batchSizes += df.count() }
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.stop()

    assert(batchSizes.sum == 6, s"every row exactly once: $batchSizes")
    assert(batchSizes.forall(_ <= 2), s"no batch may exceed the cap: $batchSizes")
    assert(batchSizes.length >= 3, s"cap must split the intake: $batchSizes")
  }
}
