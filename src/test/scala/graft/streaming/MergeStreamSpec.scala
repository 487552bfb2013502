package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.queries.Lakehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming MoR upserts: chained micro-batches equal the copy-on-write
  * result, re-delivery of a committed batch is a no-op, base files are
  * never rewritten.
  */
class MergeStreamSpec extends SparkSpec {

  test("streamed chained upserts == copy-on-write; replay no-op; base untouched") {
    val root = Files.createTempDirectory("graft-mergestream")
    val layout = root.resolve("base").toString
    val mergeDir = root.resolve("merge").toString
    val dvDir = root.resolve("dv").toString
    val srcDir = root.resolve("req").toString
    val ckpt = root.resolve("ckpt").toString
    try {
      val d = Tables(spark, sf001, "documents").select("doc_id", "text", "source")
      d.repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id")
        .write.parquet(layout)
      val baseFiles = new java.io.File(layout).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

      val m1 = d.where(col("doc_id") % 9 === 0)
        .withColumn("text", upper(col("text")))
      val m2 = d.where(col("doc_id") % 18 === 0)
        .withColumn("text", concat(col("text"), lit("?")))
      m1.coalesce(1).write.mode("append").parquet(srcDir)
      val q1 = MergeStream.start(spark, srcDir, layout, mergeDir, dvDir, ckpt)
      q1.awaitTermination(60000)
      m2.coalesce(1).write.mode("append").parquet(srcDir)
      val q2 = MergeStream.start(spark, srcDir, layout, mergeDir, dvDir, ckpt,
        trigger = Trigger.AvailableNow())
      q2.awaitTermination(60000)

      val got = Lakehouse.readMoR(spark, layout, mergeDir, dvDir)
        .select("doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = d.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
        .map { case (id, t) =>
          id -> (if (id % 18 == 0) t + "?"
            else if (id % 9 == 0) t.toUpperCase else t)
        }
      assert(got == expect, "streamed MoR merges must equal the CoW result")

      // replay batch 0 (m1) AFTER m2 committed: fully-applied no-op
      Lakehouse.mergeMoR(m1, layout, mergeDir, dvDir, "b0")
      val replay = Lakehouse.readMoR(spark, layout, mergeDir, dvDir)
        .select("doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(replay == expect, "committed-batch replay must be a no-op")

      val after = new java.io.File(layout).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      assert(after == baseFiles)
    } finally graft.StoredArtifacts.deleteTree(root.toString)
  }
}
