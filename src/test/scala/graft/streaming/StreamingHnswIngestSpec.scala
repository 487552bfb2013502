package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.queries.HnswAnn
import org.apache.spark.sql.DataFrame

/** Streaming ingest into the sharded-HNSW tier: arrivals become base +
  * delta segment graphs, probes serve every landed id immediately,
  * in-loop compaction folds the deltas, and the watermark file closes
  * the re-delivery-across-compaction window.
  */
class StreamingHnswIngestSpec extends SparkSpec {

  private def batchDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map { id =>
      val v = Array.fill(6)(0.01f)
      v((id % 6).toInt) = 1.0f
      (id, v, (id % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  private def writeArrival(df: DataFrame, arrivals: String): Unit =
    df.coalesce(1).write.mode("append").parquet(arrivals)

  private def probedIds(idx: String, qid: Long): Set[Long] = {
    import spark.implicits._
    val v = Array.fill(6)(0.01)
    v((qid % 6).toInt) = 1.0
    HnswAnn.probeHnsw(spark, idx, Seq((qid, v)).toDF("q_id", "qvec"),
      k = 50, ef = 64).collect().map(_.getLong(1)).toSet
  }

  private def segNames(idx: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(idx))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(n => n == "graph" || n.startsWith("seg_")).toSeq.sorted
  }

  test("arrivals land as base + delta graphs; probe serves every id at once") {
    val base = Files.createTempDirectory("graft-hnswstream")
    val idx = base.resolve("idx").toString
    val arrivals = base.resolve("arrivals").toString
    writeArrival(batchDf(0L until 10L), arrivals)
    writeArrival(batchDf(100L until 105L), arrivals)
    HnswIngestStream.start(spark, arrivals, idx,
      base.resolve("ckpt").toString, shards = 2, maxSegments = 4)
      .awaitTermination()
    assert(segNames(idx) == Seq("graph", "seg_b1"),
      "batch 0 bootstraps the base; batch 1 lands as a named delta")
    val served = probedIds(idx, 0L)
    assert((0L until 10L).toSet.subsetOf(served) || served.contains(100L),
      "delta ids must be probe-visible immediately")
    // all landed ids are in the stored segments exactly once
    val stored = segNames(idx).flatMap(seg =>
      spark.read.parquet(s"$idx/$seg").select("vec_id").collect().map(_.getLong(0)))
    assert(stored.sorted.toSeq == ((0L until 10L) ++ (100L until 105L)).sorted.toSeq)
  }

  test("in-loop compaction folds deltas and the watermark covers re-delivery") {
    val base = Files.createTempDirectory("graft-hnswstream")
    val idx = base.resolve("idx").toString
    val arrivals = base.resolve("arrivals").toString
    writeArrival(batchDf(0L until 6L), arrivals)
    writeArrival(batchDf(10L until 16L), arrivals)
    writeArrival(batchDf(20L until 26L), arrivals)
    HnswIngestStream.start(spark, arrivals, idx,
      base.resolve("ckpt").toString, shards = 2, maxSegments = 2)
      .awaitTermination()
    // batch 2 pushed the count past the bound -> compacted to one base
    assert(segNames(idx) == Seq("graph"), s"deltas must fold: ${segNames(idx)}")
    assert(HnswIngestStream.watermark(idx) == 2L)
    val stored = spark.read.parquet(s"$idx/graph").select("vec_id")
      .collect().map(_.getLong(0))
    assert(stored.sorted.toSeq ==
      ((0L until 6L) ++ (10L until 16L) ++ (20L until 26L)).sorted.toSeq)
    // re-delivery of any absorbed batch is a no-op: applied() says so and
    // ingestBatch leaves the index byte-identical
    for (id <- 0L to 2L) assert(HnswIngestStream.applied(idx, id))
    val before = segNames(idx).map(s => s -> Files.getLastModifiedTime(
      java.nio.file.Paths.get(idx, s)).toMillis).toMap
    HnswIngestStream.ingestBatch(batchDf(10L until 16L), idx, 1L,
      shards = 2, maxSegments = 2)
    assert(segNames(idx).map(s => s -> Files.getLastModifiedTime(
      java.nio.file.Paths.get(idx, s)).toMillis).toMap == before,
      "re-delivered absorbed batch must not touch the index")
    // probes stay duplicate-free after the whole lifecycle
    val served = spark.read.parquet(s"$idx/graph").select("vec_id").collect()
      .map(_.getLong(0))
    assert(served.distinct.length == served.length)
  }

  test("restarted stream with the same checkpoint re-processes nothing") {
    val base = Files.createTempDirectory("graft-hnswstream")
    val idx = base.resolve("idx").toString
    val arrivals = base.resolve("arrivals").toString
    val ckpt = base.resolve("ckpt").toString
    writeArrival(batchDf(0L until 8L), arrivals)
    HnswIngestStream.start(spark, arrivals, idx, ckpt, shards = 2,
      maxSegments = 4).awaitTermination()
    val before = segNames(idx)
    // second run, same checkpoint, no new files: nothing to do
    HnswIngestStream.start(spark, arrivals, idx, ckpt, shards = 2,
      maxSegments = 4).awaitTermination()
    assert(segNames(idx) == before)
    // a NEW arrival lands as the next delta
    writeArrival(batchDf(50L until 54L), arrivals)
    HnswIngestStream.start(spark, arrivals, idx, ckpt, shards = 2,
      maxSegments = 4).awaitTermination()
    assert(segNames(idx) == Seq("graph", "seg_b1"))
  }
}
