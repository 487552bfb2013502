package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Gates for x64 incremental SemDeDup: a new batch verdicted against the
  * STORED standing index — planted semantic near-dups of standing content
  * caught, genuinely fresh vectors spared, and a read path whose cost is
  * batch-side only (no standing-corpus rescan, no shuffled joins, no
  * k-means rounds).
  */
class IncrementalSemDedupSpec extends SparkSpec {

  // standing corpus: SemDedupSpec's planted geometry — 3 orthogonal meaning
  // directions, 4 core vectors + 1 angularly distant member each
  private lazy val standing = {
    import spark.implicits._
    val rows = for {
      c <- 0 until 3
      j <- 0 until 5
    } yield {
      val v = Array.fill(6)(0.0f)
      v(c) = 1.0f
      if (j < 4) v(3) = 0.01f * (j + 1)
      else v(4) = 1.0f
      ((c * 10 + j).toLong, v, s"c$c")
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  // new batch (ids disjoint from standing): one near-dup of each standing
  // core direction (a rewording of standing content — must be caught) and
  // one genuinely novel direction (must be spared)
  private lazy val batch = {
    import spark.implicits._
    val dups = (0 until 3).map { c =>
      val v = Array.fill(6)(0.0f)
      v(c) = 1.0f
      v(3) = 0.05f // noise distinct from every standing member
      ((100 + c).toLong, v, s"c$c")
    }
    val fresh = {
      val v = Array.fill(6)(0.0f)
      v(5) = 1.0f // a direction no standing cluster occupies
      Seq((200L, v, "c0"))
    }
    (dups ++ fresh).toDF("vec_id", "embedding", "label")
  }

  test("batch near-dups of standing content are caught; the fresh vector is spared") {
    val base = Files.createTempDirectory("graft-semidx")
    val idx = base.resolve("sem").toString
    try {
      val (cs, reps) = Similarity.semIndex(standing, iters = 2)
      Similarity.writeSemIndex(spark, cs, reps, idx)
      val (centroids, storedReps) = Similarity.readSemIndex(spark, idx)

      val out = Similarity
        .semDedupIncremental(batch, centroids, storedReps, tau = 0.95)
      val rows = out.collect()
      assert(rows.length == 4, "one verdict row per batch vector")
      val byId = rows.map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
      for (c <- 0 until 3) {
        val (repId, sim, dup) = byId((100 + c).toLong)
        assert(dup, s"planted batch near-dup of cluster $c must be flagged (sim $sim)")
        // flagged against a STANDING representative, which is a core member
        assert((0 until 4).map(j => (c * 10 + j).toLong).contains(repId),
          s"batch dup must match a standing core representative, got $repId")
      }
      assert(!byId(200L)._3,
        s"fresh direction wrongly flagged (sim ${byId(200L)._2})")

      // cost shape: batch-side only. Every file scan reads the INDEX (the
      // standing corpus is not re-scanned — it isn't even reachable from
      // this plan), assignment is a narrow argmin against centroid
      // literals, and the only joins are broadcast against the k-row rep
      // table — x55's no-shuffled-join discipline, now on the probe path.
      val nodes = SparkSpec.allPlanNodes(out.queryExecution.executedPlan)
      val scans = nodes.collect { case f: FileSourceScanExec => f }
      assert(scans.forall(_.metadata.get("Location").exists(_.contains("graft-semidx"))),
        "incremental probe must read only the stored index")
      assert(!nodes.exists(n =>
        n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
        "incremental semantic dedup must join only against the broadcast rep table")
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("incremental verdicts agree with a full batch re-run over the fixture corpus") {
    // ground truth: run FULL SemDeDup over standing+batch with the SAME
    // cluster structure (standing-built index; batch assigned into it).
    // For every batch vector, incremental must agree with what the full
    // pass says about its similarity to the standing representative.
    val (cs, reps) = Similarity.semIndex(standing, iters = 2)
    val inc = Similarity.semDedupIncremental(batch, cs, reps, tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // manual recomputation: cosine of each batch vector to its assigned
    // cluster's representative
    val repRows = reps.collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](2).map(_.toDouble).toArray).toMap
    val batchRows = batch.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def argmin(v: Array[Double]): Int =
      cs.zipWithIndex.minBy { case (c, _) =>
        c.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum
      }._2
    for ((id, v) <- batchRows) {
      val expected = cos(v, repRows(argmin(v))) >= 0.95
      assert(inc(id) == expected, s"batch vector $id verdict drifted from reference")
    }
  }

  test("x64 registry entry runs end to end over the fixture embeddings") {
    val out = SparkEntry.queries("x64_semantic_dedup_incremental")(spark, sf001)
    val rows = out.collect()
    // one verdict per batch vector (vec_id >= 250), every id present
    val expect = graft.Tables(spark, sf001, "embeddings")
      .where(col("vec_id") >= 250).count()
    assert(rows.length == expect, "one verdict row per batch vector")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }
}
