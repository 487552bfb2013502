package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Gates for filtered ANN serving (x91): the metadata predicate must
  * compose with the pruned probe without changing any score, the
  * pre-filter semi join must equal post-filtering the unfiltered probe,
  * and the filtered results must track the exact filtered scan.
  */
class FilteredAnnSpec extends SparkSpec {

  test("pre-filter probe equals post-filtered unfiltered probe; results satisfy the predicate") {
    import graft.queries.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft-fann")
    val idx = base.resolve("ivf").toString
    try {
      val e = Tables(spark, sf001, "embeddings")
      Similarity.writeIvfIndex(e, idx, iters = 2)
      val qvec = e.where(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toArray
      val allowed = e.where(pmod(col("label"), lit(2)) === 0 &&
        col("vec_id") =!= 0).select(col("vec_id"))
      val allowedIds = allowed.collect().map(_.getLong(0)).toSet

      val pre = Similarity.probeStoredIvfFiltered(spark, idx, qvec, 6, allowed)
      val preRows = pre.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // the same cells, the same kernel — filtering never changes a score
      val post = Similarity.probeStoredIvf(spark, idx, qvec, 6)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        .filter { case (id, _) => allowedIds.contains(id) }
      assert(preRows == post,
        "pre-filter semi join must equal post-filtering the unfiltered probe")
      assert(preRows.keySet.subsetOf(allowedIds),
        "every candidate must satisfy the predicate")

      // top-10 among allowed vectors tracks the exact filtered scan
      val got = preRows.toSeq.sortBy { case (id, sim) => (-sim, id) }
        .take(10).map(_._1).toSet
      val exact = e.where(col("vec_id") =!= 0)
        .select(col("vec_id"),
          graft.functions.VectorOps.cosine(col("embedding"),
            typedLit(qvec)).as("sim"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1))
        .filter { case (id, _) => allowedIds.contains(id) }
        .sortBy { case (id, sim) => (-sim, id) }
        .take(10).map(_._1).toSet
      val recall = (got intersect exact).size / 10.0
      assert(recall >= 0.9, s"filtered recall@10 = $recall")

      // the filter must not break the serving plan: pruned scan, no
      // corpus table, broadcast semi join
      val plan = pre.queryExecution.executedPlan
      val scans = graft.SparkSpec.allPlanNodes(plan)
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      val cellScan = scans.find(_.metadata.getOrElse("Location", "").contains("cells"))
      assert(cellScan.isDefined, "probe must scan the stored cells")
      assert(cellScan.get.metadata.getOrElse("PartitionFilters", "").contains("cluster"),
        "cluster IN (...) must still prune partitions under the filter join")
      val semiJoins = graft.SparkSpec.allPlanNodes(plan).collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if b.joinType.sql.contains("SEMI") => b
      }
      assert(semiJoins.nonEmpty, "the predicate must ride a broadcast semi join")
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("x216: filtered HNSW probe — purity, recall vs exact filtered scan, determinism") {
    import org.apache.spark.sql.functions._
    val e = Tables(spark, sf001, "embeddings")
    val got = graft.SparkEntry.queries("x216_ann_hnsw_filtered")(spark, sf001)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.length == 10, s"top-10, got ${got.length}")
    val labels = e.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { case (id, _) =>
      assert(labels(id) % 2 == 0 && id != 0L,
        s"vec $id label ${labels(id)} violates the filter")
    }
    // recall vs exact filtered brute force
    val rows = e.select(col("vec_id"),
      col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val q = rows.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = rows.filter { case (id, _) => id != 0L && labels(id) % 2 == 0 }
      .map { case (id, v) => id -> cos(v, q) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val recall = (got.map(_._1).toSet intersect exact).size / 10.0
    assert(recall >= 0.9, s"filtered graph recall@10 = $recall")
    // scored sims are exact cosines of the returned candidates
    got.foreach { case (id, sim) =>
      val expect = cos(rows.find(_._1 == id).get._2, q)
      assert(sim == expect, s"vec $id: sim $sim != exact $expect")
    }
    // deterministic across invocations
    val again = graft.SparkEntry.queries("x216_ann_hnsw_filtered")(spark, sf001)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("x91 registry entry serves even-label top-20 deterministically") {
    val got = graft.SparkEntry.queries("x91_ann_filtered")(spark, sf001).collect()
    assert(got.length == 20, s"top-20, got ${got.length}")
    val labels = Tables(spark, sf001, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { r =>
      val id = r.getLong(0)
      assert(labels(id) % 2 == 0, s"vec $id label ${labels(id)} violates the filter")
      assert(id != 0L, "the query vector itself is excluded")
    }
    val again = graft.SparkEntry.queries("x91_ann_filtered")(spark, sf001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
