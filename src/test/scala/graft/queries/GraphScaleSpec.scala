package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}

/** The graph family's 100 TB shape, pinned (the r8 VERDICT weak item):
  * iterative supersteps must be CO-PARTITIONED — the edge table hash-
  * partitioned by its join key once and never re-shuffled, the node-sized
  * rank table shuffled TO it, no static broadcast of a table that grows
  * with the node count, no single-partition checkpoint — and the edge
  * list itself must be a build-once stored artifact every graph query
  * serves from (the x62 discipline).
  */
class GraphScaleSpec extends SparkSpec {

  test("superstep: no static rank broadcast, edge side exchange-free, >1-partition agg") {
    val e = Graph.storedEdges(spark, sf001)
    val step = Graph.superstepForSpec(e)
    // the PREPARED pre-execution plan (exchanges inserted, AQE not yet
    // run) — the decision this shape drives; at runtime AQE may still
    // convert a tiny observed rank shuffle to a broadcast, which is the
    // size-aware version of the choice and exactly right
    val plan = step.queryExecution.executedPlan
    val nodes = SparkSpec.allPlanNodes(plan)
    assert(!nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]) &&
      !nodes.exists(_.isInstanceOf[BroadcastExchangeExec]),
      s"rank table must never be statically broadcast:\n$plan")
    val joins = nodes.collect { case j: ShuffledHashJoinExec => j }
    assert(joins.nonEmpty, s"superstep join must be a shuffled hash join " +
      s"(rank side built per partition, edge side unsorted):\n$plan")
    // the edge (streamed) side reuses the checkpointed HashPartitioning:
    // no exchange anywhere below the join on that side
    val streamed = SparkSpec.allPlanNodes(joins.head.left)
    assert(!streamed.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"edge side must never re-shuffle:\n$plan")
    // every exchange in the superstep is multi-partition: the r8
    // coalesce(1)-per-superstep single-task bottleneck is gone
    val ex = nodes.collect { case x: ShuffleExchangeExec => x }
    assert(ex.nonEmpty && ex.forall(_.outputPartitioning.numPartitions > 1),
      s"superstep exchanges must be multi-partition:\n$plan")
  }

  test("superstep results are unchanged by the co-partitioned rewrite") {
    // the rewrite is a pure plan change: ranks from the co-partitioned
    // loop equal a driver-side replay of the same integer recurrence
    val li = graft.Tables(spark, sf001, "lineitem")
    val edges = Graph.copurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var ref: Map[Long, Long] = adj.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 8) {
      val contrib = adj.toSeq.flatMap { case (n, ns) =>
        val c = ref(n) / ns.size; ns.map(_ -> c)
      }.groupBy(_._1).map { case (n, cs) => n -> cs.map(_._2).sum }
      ref = adj.keys.map(n => n -> (150000L + 850L * contrib(n) / 1000L)).toMap
    }
    val got = Graph.pagerank(li, iters = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("stored edge artifact: built once, second touch re-reads without rebuild") {
    val store = graft.StoredArtifacts.dir(sf001, "copurchase_edges_v1")
    Graph.storedEdges(spark, sf001).count()
    assert(graft.StoredArtifacts.ready(store))
    val mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(store, "_SUCCESS")).toMillis
    // second touch: serves the same generation, no rewrite
    val again = Graph.storedEdges(spark, sf001)
    assert(again.count() > 0)
    val mtime2 = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(store, "_SUCCESS")).toMillis
    assert(mtime2 == mtime, "second touch must not rebuild the artifact")
    // the artifact IS the edge list: identical row set
    val fromStore = again.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = Graph.copurchaseEdges(graft.Tables(spark, sf001, "lineitem"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromStore == fresh)
  }

  test("iterative registry queries serve index-only: no lineitem scan anywhere") {
    for (name <- Seq("x124_copurchase_pagerank", "x129_degree_profile",
        "x130_label_propagation", "x131_kcore", "x139_hop_distance",
        "x168_personalized_pagerank", "x242_degree_assortativity",
        "x243_closeness_profile", "x254_landmark_distance")) {
      val df = SparkEntry.queries(name)(spark, sf001)
      df.collect()
      val scans = SparkSpec.allPlanNodes(df.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec => f }
      scans.foreach { sc =>
        val loc = sc.metadata.getOrElse("Location", "")
        assert(!loc.contains("lineitem"),
          s"$name: serving query must read the stored artifact, not the facts ($loc)")
      }
    }
  }
}
