package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** x58's production claim, demonstrated end to end: the tf-enriched posting
  * index written as a STORED artifact (sorted by token so row-group stats
  * cluster by term), read back with the query's term filter pushed into the
  * parquet scan, and scored through the same bm25Rank tail — producing the
  * scan path's exact answer. At 100 TB this is the plan that never touches
  * document text at query time.
  */
class StoredIndexSpec extends SparkSpec {

  test("stored posting index: term filter pushes to the scan; scores match the scan path") {
    val base = Files.createTempDirectory("graft-index")
    val out = base.resolve("postings").toString
    try {
      val d = Tables(spark, sf001, "documents")
      Retrieval.scoredIndex(d, segWidth = 64L)
        .sortWithinPartitions("token") // cluster row-group min/max by term
        .write.mode("overwrite").parquet(out)

      val qterms = Seq("vector", "window", "scan")
      val stored = spark.read.parquet(out).where(col("token").isin(qterms: _*))
      stored.collect()
      val plan = stored.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [") && plan.contains("In(token"),
        s"term predicate must reach the parquet scan as a pushed filter:\n$plan")

      // read path equivalence: postings from disk -> same bm25Rank tail ->
      // byte-identical scores and ranking vs the scan-fed x46
      val tf = stored
        .select(col("token"), explode(col("postings")).as("p"))
        .select(col("p.doc_id").as("doc_id"), col("token"), col("p.tf").as("tf"))
      val fromDisk = Retrieval.bm25Rank(d, tf).collect().toSeq
      val fromScan = SparkEntry.queries("x46_bm25_rank")(spark, sf001).collect().toSeq
      assert(fromDisk == fromScan,
        "stored-index BM25 must equal the scan-path ranking row for row")
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
