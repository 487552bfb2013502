package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** x105's index-health report: the per-cell populations must be exactly the
  * stored index's contents, the roll-ups exact integer arithmetic over
  * them, and the plan must never open the corpus or even the vector
  * payload — a monitor that costs a table scan of the data it monitors
  * defeats its purpose.
  */
class IndexStatsSpec extends SparkSpec {

  test("ivf index stats: exact per-cell counts, exact roll-ups, payload-free index-only scan") {
    val base = Files.createTempDirectory("graft-ivfstats")
    val idx = base.resolve("ivf").toString
    try {
      val e = Tables(spark, sf001, "embeddings")
      Similarity.writeIvfIndex(e, idx, iters = 2)

      val stats = Similarity.ivfIndexStats(spark, idx)
      val rows = stats.collect()

      // ground truth: recount the cells table directly
      val truth = spark.read.parquet(s"$idx/cells")
        .groupBy(col("cluster")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(rows.map(_.getInt(0)).toSet == truth.keySet, "one row per cell")
      for (r <- rows)
        assert(r.getLong(1) == truth(r.getInt(0)),
          s"cell ${r.getInt(0)}: reported ${r.getLong(1)} != actual ${truth(r.getInt(0))}")

      // roll-ups: every row carries the same exact totals
      val k = truth.size.toLong
      val total = truth.values.sum
      val mx = truth.values.max
      assert(total == e.count(), "index must cover the corpus")
      for (r <- rows) {
        assert(r.getLong(2) == k && r.getLong(3) == total)
        assert(r.getLong(4) == truth.values.min && r.getLong(5) == mx)
        assert(r.getLong(6) == 1000L * mx * k / total,
          s"imbalance must be 1000·max·k div total, got ${r.getLong(6)}")
      }

      // plan discipline: only the index is scanned, and the scan reads NO
      // payload columns — `cluster` is the partition directory, so the
      // required data schema is empty
      val scans = SparkSpec.allPlanNodes(stats.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty)
      assert(scans.forall(_.metadata.get("Location").exists(_.contains("graft-ivfstats"))),
        s"stats must scan only the stored index:\n${stats.queryExecution.executedPlan}")
      for (sc <- scans; schema <- sc.metadata.get("ReadSchema")) {
        assert(!schema.contains("embedding") && !schema.contains("vec_id"),
          s"monitor must not read vector payloads: $schema")
      }
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("x396 exact twin: hash-bucketed cells through the SAME harness match a direct recount") {
    val got = SparkEntry.queries("x396_index_stats_exact")(spark, sf001).collect()
    // independent recount: the md5 bucket rule applied straight to the
    // fixture (no stored artifact, no shared code path)
    val truth = Tables(spark, sf001, "embeddings")
      .select(expr("""CAST(conv(substring(md5(concat('ix:',
          cast(vec_id as string))), 1, 8), 16, 10) AS BIGINT) % 16""")
        .as("cluster"))
      .groupBy("cluster").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.map(_.getLong(0)).toSet == truth.keySet)
    val k = truth.size.toLong
    val total = truth.values.sum
    for (r <- got) {
      assert(r.getLong(1) == truth(r.getLong(0)), s"cell count: $r")
      assert(r.getLong(2) == k && r.getLong(3) == total)
      assert(r.getLong(4) == truth.values.min && r.getLong(5) == truth.values.max)
      assert(r.getLong(6) == 1000L * truth.values.max * k / total)
    }
  }

  test("x105 registry entry reports the shared stored index deterministically") {
    val got = SparkEntry.queries("x105_ann_index_stats")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty, "stats must have one row per cell")
    val total = got.head(3).asInstanceOf[Long]
    assert(got.map(_(1).asInstanceOf[Long]).sum == total,
      "per-cell counts must sum to the reported total")
    val again = SparkEntry.queries("x105_ann_index_stats")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(got == again, "index stats must be deterministic across invocations")
  }
}
