package graft.streaming

import graft.SparkSpec
import graft.queries.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-ingest near-dup dedup against the STORED LSH index: documents
  * arrive on an unbounded stream, and each micro-batch is verdicted with
  * the SAME probeLshIndex code the static x66 runs (`foreachBatch` makes
  * every micro-batch a static frame) — the production continuous-ingest
  * pattern: one verified-probe implementation, batch and streaming both,
  * with the standing corpus present only as its persisted signature/band
  * artifact.
  */
class StreamingIncrementalLshSpec extends SparkSpec {

  test("streamed micro-batches probe the stored index: near-copies flagged, fresh docs pass") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val other = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val idxBase = java.nio.file.Files.createTempDirectory("graft-lsh-stream")
    val idx = idxBase.resolve("lsh").toString
    try {
      Dedup.writeLshIndex(
        Seq((10L, base), (11L, other)).toDF("doc_id", "text"), idx)

      val input = MemoryStream[(Long, String)]
      val results = scala.collection.mutable.Map[Long, Option[Long]]()
      val q = input.toDF().toDF("doc_id", "text")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Dedup.probeLshIndex(batch, idx).collect().foreach { r =>
            results(r.getLong(0)) =
              Option(r.get(1)).map(_.asInstanceOf[Long])
          }
        }
        .start()

      // micro-batch 1: a near-copy of standing doc 10 + a genuinely new doc
      val nearCopy = (1 to 58).map(i => s"tok$i").mkString(" ") + " c1 c2"
      val fresh = (1 to 60).map(i => s"new$i").mkString(" ")
      input.addData((100L, nearCopy), (101L, fresh))
      q.processAllAvailable()
      // micro-batch 2: another near-copy arrives later in the stream
      val nearCopy2 = "x " + (1 to 59).map(i => s"tok$i").mkString(" ")
      input.addData((102L, nearCopy2))
      q.processAllAvailable()
      q.stop()

      assert(results.keySet == Set(100L, 101L, 102L), s"one verdict per streamed doc: $results")
      assert(results(100L).contains(10L),
        s"batch-1 near-copy must match standing doc 10: ${results(100L)}")
      assert(results(101L).isEmpty, "genuinely new doc must pass")
      assert(results(102L).contains(10L),
        s"batch-2 near-copy must match standing doc 10: ${results(102L)}")
    } finally graft.StoredArtifacts.deleteTree(idxBase.toString)
  }
}
