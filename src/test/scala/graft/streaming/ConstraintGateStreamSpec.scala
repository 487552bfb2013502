package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming constraint gate: the pass/quarantine split over replayed
  * fixture batches equals the batch x205 verdicts (shared rule
  * definitions make drift impossible; this pins the plumbing), nothing
  * is lost or duplicated across batches, and batch-id re-delivery is
  * idempotent.
  */
class ConstraintGateStreamSpec extends SparkSpec {

  test("stream split == batch x205 verdicts; partition-complete; idempotent") {
    val root = Files.createTempDirectory("graft-gate")
    val srcDir = root.resolve("src").toString
    val outDir = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    try {
      val ev = Tables(spark, sf001, "events")
      // two arrival batches
      ev.where(col("event_id") % 2 === 0)
        .coalesce(1).write.mode("append").parquet(srcDir)
      val q1 = ConstraintGateStream.start(spark, srcDir, ev.schema, outDir,
        ckpt, trigger = Trigger.AvailableNow())
      q1.awaitTermination(60000)
      ev.where(col("event_id") % 2 === 1)
        .coalesce(1).write.mode("append").parquet(srcDir)
      val q2 = ConstraintGateStream.start(spark, srcDir, ev.schema, outDir,
        ckpt, trigger = Trigger.AvailableNow())
      q2.awaitTermination(60000)

      val pass = spark.read.parquet(s"$outDir/pass/batch_*")
      val quar = spark.read.parquet(s"$outDir/quarantine/batch_*")
      // complete partition of the input
      assert(pass.count() + quar.count() == ev.count())
      assert(pass.join(quar, Seq("event_id"), "inner").count() == 0,
        "a row must land in exactly one sink")
      // quarantine verdicts equal the batch x205 gate rows
      val got = quar.select(col("event_id"), col("violated"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = graft.SparkEntry.queries("x205_write_constraints")(spark, sf001)
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
      assert(got == batch,
        s"missing=${(batch -- got).take(3)} extra=${(got -- batch).take(3)}")
      // pass rows genuinely satisfy every rule
      val passBad = graft.queries.Lakehouse
        .withViolations(pass, graft.queries.Lakehouse.eventConstraints)
        .where(col("violated") =!= "").count()
      assert(passBad == 0L)

      // re-delivery of a batch id rewrites its own bytes only
      val before = pass.count()
      ConstraintGateStream.gate(
        spark.read.parquet(srcDir).where(col("event_id") % 2 === 0),
        outDir, 0L)
      spark.catalog.refreshByPath(s"$outDir/pass/batch_*")
      assert(spark.read.parquet(s"$outDir/pass/batch_*").count() == before,
        "re-delivered batch must not duplicate rows")
    } finally graft.StoredArtifacts.deleteTree(root.toString)
  }
}
