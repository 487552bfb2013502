package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for x55 SemDeDup: semantic near-duplicates (same meaning-vector
  * direction, regardless of lexical form) must be flagged against their
  * cluster representative; spread-out cluster members and the
  * representatives themselves must survive; and the plan must never form
  * cross-cluster or pairwise comparisons (cost = one score per member).
  */
class SemDedupSpec extends SparkSpec {

  // three orthogonal meaning directions; per cluster: 4 near-identical
  // "core" vectors (planted semantic dups — distinct noise = distinct
  // lexical form, same direction) + 1 angularly distant member that still
  // belongs to the cluster (cos ~0.71 to the core, ~0 to other clusters)
  private lazy val planted = {
    import spark.implicits._
    val rows = for {
      c <- 0 until 3
      j <- 0 until 5
    } yield {
      val v = Array.fill(6)(0.0f)
      v(c) = 1.0f
      if (j < 4) v(3) = 0.01f * (j + 1) // cores: tiny per-member noise
      else v(4) = 1.0f                  // far member: 45 degrees off the core
      ((c * 10 + j).toLong, v, s"c$c")
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("planted semantic near-dups are flagged; reps and distant members survive") {
    val out = Similarity.semDedup(planted, iters = 2, tau = 0.95).collect()
    assert(out.length == 15, "one verdict row per input vector")
    assert(out.map(_.getLong(0)).distinct.length == 15)

    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap // rep_id, sim, dup
    for (c <- 0 until 3) {
      val ids = (0 until 5).map(j => (c * 10 + j).toLong)
      val clusters = out.filter(r => ids.contains(r.getLong(0))).map(_.getInt(1)).distinct
      assert(clusters.length == 1,
        s"planted cluster $c split across kmeans cells $clusters")
      val repId = byId(ids.head)._1
      assert(ids.forall(byId(_)._1 == repId), "one representative per cluster")
      assert((0 until 4).map(j => (c * 10 + j).toLong).contains(repId),
        s"representative must be a core member (closest to centroid), got $repId")
      assert(!byId(repId)._3, "the kept representative is never flagged")
      assert(math.abs(byId(repId)._2 - 1.0) < 1e-12,
        "rep scored against itself (cos 1 up to sqrt(s)·sqrt(s) ulps)")
      for (j <- 0 until 4; id = (c * 10 + j).toLong if id != repId)
        assert(byId(id)._3, s"planted near-dup $id must be flagged (sim ${byId(id)._2})")
      val farId = (c * 10 + 4).toLong
      assert(!byId(farId)._3,
        s"distant member $farId wrongly flagged (sim ${byId(farId)._2})")
      assert(byId(farId)._2 < 0.8 && byId(farId)._2 > 0.6,
        s"distant member should sit ~cos 0.71 from the core, got ${byId(farId)._2}")
    }
  }

  test("iters = 0 clusters on the seed centroids as-is (no refine round)") {
    val out = Similarity.semDedup(planted, iters = 0, tau = 0.95).collect()
    assert(out.length == 15)
    // the planted geometry is orthogonal, so even the unrefined seed
    // separates the three clusters
    assert(out.map(_.getInt(1)).distinct.length == 3)
  }

  test("x57 composes the lexical and semantic gates consistently over the fixture") {
    import org.apache.spark.sql.functions.col
    val d = graft.Tables(spark, sf001, "documents")
    val out = graft.SparkEntry.queries("x57_semantic_clean")(spark, sf001).collect()
    assert(out.length == d.count(), "one verdict row per document")
    val lex = Dedup.cleanCorpus(d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sem = Similarity.semDedup(graft.Tables(spark, sf001, "embeddings"),
        iters = 2, tau = 0.9)
      .where(col("is_semantic_dup"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val embedded = graft.Tables(spark, sf001, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    for (r <- out) {
      val (id, lexKeep, semDup, keep) =
        (r.getLong(0), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))
      assert(lexKeep == lex.contains(id), s"doc $id lexical flag drifted")
      assert(semDup == sem.contains(id), s"doc $id semantic flag drifted")
      if (!embedded.contains(id))
        assert(!semDup, s"doc $id has no embedding and cannot be a semantic dup")
      assert(keep == (lexKeep && !semDup), s"doc $id verdict inconsistent")
    }
  }

  test("cost shape: one score per member, no pairwise or cross-cluster comparison") {
    val df = Similarity.semDedup(planted, iters = 1, tau = 0.95)
    // every member is scored against exactly ONE representative — the
    // output has one row per input vector, so the n²-per-cluster pairwise
    // matrix (and any cross-cluster pair) was never materialized
    assert(df.count() == 15)
    df.collect()
    val nodes = SparkSpec.allPlanNodes(df.queryExecution.executedPlan)
    assert(!nodes.exists(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "semantic dedup must not contain any all-pairs join")
    // ...and no shuffled join at all: cluster membership is a narrow argmin
    // against broadcast centroids, so the only joins are broadcast-hash
    // against the tiny centroid/representative tables — a sort-merge or
    // shuffled-hash join here would mean the vector corpus is being
    // exchanged (the round-4 review catch: joining refine's (id, cluster)
    // table back would do exactly that at production scale)
    assert(!nodes.exists(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      "semantic dedup must join only against broadcast side tables")
  }
}
