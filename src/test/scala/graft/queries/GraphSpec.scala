package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph-analytics family (x123/x124/x126/x129 are DuckDB-hash-gated;
  * these specs pin the algorithmic invariants the hash can't see — that
  * the degree-ORDERED triangle orientation enumerates the same census a
  * brute-force per-node count does, that integer PageRank conserves its
  * invariants, and that link-prediction pairs are genuinely non-adjacent.
  */
class GraphSpec extends SparkSpec {

  private lazy val li = graft.Tables(spark, sf001, "lineitem")

  test("x123: degree-ordered census equals brute-force per-node triangle count") {
    val got = Graph.triangleCensus(li).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // brute force on the driver: adjacency sets, count common neighbors
    val edges = Graph.copurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val triBrute = adj.map { case (v, ns) =>
      v -> ns.toSeq.combinations(2).count { case Seq(a, b) => adj(a)(b) }
    }
    assert(got.keySet == adj.keySet)
    adj.foreach { case (v, ns) =>
      val (deg, tri, cc) = got(v)
      assert(deg == ns.size, s"deg($v)")
      assert(tri == triBrute(v).toLong, s"triangles($v)")
      val expCc = if (deg > 1) 2000L * tri / (deg * (deg - 1)) else 0L
      assert(cc == expCc, s"cc_milli($v)")
    }
    // the fixture graph is non-trivial: some node closes a triangle
    assert(got.values.exists(_._2 > 0))
  }

  test("x124: integer pagerank — node set, bounds and a hub ranking signal") {
    val pr = Graph.pagerank(li, iters = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val deg = Graph.degrees(Graph.copurchaseEdges(li)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.keySet == deg.keySet)
    // every rank >= the teleport floor; integer division only loses mass
    assert(pr.values.forall(r => r >= 150000L && r <= pr.size * 1000000L))
    // total mass stays within the teleport+damping identity modulo the
    // per-edge floor loss: sum <= n * 1e6, and above the teleport-only floor
    val total = pr.values.sum
    assert(total <= pr.size.toLong * 1000000L)
    assert(total > pr.size.toLong * 150000L)
    // determinism: a second run is bit-identical (checkpointed iterations)
    val pr2 = Graph.pagerank(li, iters = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == pr2)
    // the max-degree node outranks the min-degree node (symmetric-graph
    // pagerank tracks degree)
    val hub = deg.maxBy { case (n, d) => (d, -n) }._1
    val leaf = deg.minBy { case (n, d) => (d, n) }._1
    assert(pr(hub) > pr(leaf))
  }

  test("x126: link-prediction pairs are non-adjacent with exact common counts") {
    val edges = Graph.copurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val got = Graph.linkPrediction(li, topN = 100).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (ua, ub, n, j) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ua < ub)
      assert(!edges((ua, ub)), s"($ua,$ub) must be non-adjacent")
      val common = (adj(ua) & adj(ub)).size.toLong
      assert(n == common, s"common($ua,$ub)")
      assert(j == 1000L * common / (adj(ua).size + adj(ub).size - common))
    }
  }

  test("x129: degree survival profile is a valid monotone survival function") {
    val rows = Graph.degreeProfile(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    // ascending in degree, ge_nodes strictly decreasing, ends at max deg
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    rows.sliding(2).foreach {
      case Array((_, _, ge1, _), (_, _, ge2, _)) => assert(ge1 > ge2)
      case _ =>
    }
    assert(rows.head._3 == total) // smallest degree row covers everyone
    rows.foreach { case (_, _, ge, s) => assert(s == 1000L * ge / total) }
  }

  test("x130: label propagation equals a driver-side synchronous reference") {
    val edges = Graph.copurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var ref: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      ref = adj.map { case (n, ns) =>
        val counts = ns.map(ref).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got = Graph.labelPropagation(li, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
    // non-trivial: propagation coarsened the initial one-label-per-node state
    assert(got.values.toSet.size < got.size)
  }

  test("x131: k-core peeling converges within the round budget and is a true 3-core") {
    val core = Graph.kCore(li, k = 3, rounds = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val more = Graph.kCore(li, k = 3, rounds = 9).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == more, "one more peel must be a fixed point on the fixture")
    // every member has >= 3 neighbors INSIDE the core
    val edges = Graph.copurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val inCore = core.keySet
    val coreAdj = edges.filter { case (a, b) => inCore(a) && inCore(b) }
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    core.foreach { case (n, d) =>
      assert(coreAdj(n).size >= 3)
      assert(d == coreAdj(n).size.toLong)
    }
  }

  test("x125: CMS estimate dominates the exact count; identical keys collide consistently") {
    val ev = graft.Tables(spark, sf001, "events")
    val got = Events.cmsFrequency(ev, depth = 4, hexChars = 2).collect()
    val exact = ev.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.length == exact.size)
    got.foreach { r =>
      val (u, en, cn, over) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(en == exact(u))
      assert(cn >= en, s"CMS is one-sided: est($u)=$cn < exact $en")
      assert(over == cn - en)
    }
  }
}
