package graft.queries

import graft.{SparkEntry, SparkSpec}
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
    // candN=500 covers every sf0.001 node — the unrestricted semantics
    val got = Graph.linkPrediction(li, candN = 500, topN = 100).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (ua, ub, n, j) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ua < ub)
      assert(!edges((ua, ub)), s"($ua,$ub) must be non-adjacent")
      val common = (adj(ua) & adj(ub)).size.toLong
      assert(n == common, s"common($ua,$ub)")
      assert(j == 1000L * common / (adj(ua).size + adj(ub).size - common))
    }
    // a REAL candidate restriction: endpoints confined to the top-20
    // degree set, but common-neighbor counts stay exact (centers range
    // over all nodes)
    val top20 = adj.toSeq.map { case (n, ns) => (n, ns.size) }
      .sortBy { case (n, d) => (-d, n) }.take(20).map(_._1).toSet
    val restricted = Graph.linkPrediction(li, candN = 20, topN = 100).collect()
    assert(restricted.nonEmpty)
    restricted.foreach { r =>
      val (ua, ub, n, _) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(top20(ua) && top20(ub), s"($ua,$ub) must be candidate-confined")
      assert(n == (adj(ua) & adj(ub)).size.toLong,
        s"restricted common($ua,$ub) must stay exact")
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

  test("x215: modularity equals the driver-side Newman formula over the same labels") {
    val rows = SparkEntry.queries("x215_modularity")(spark, sf001).collect()
    assert(rows.length == 1)
    val (nc, m, qMicro) = (rows(0).getLong(0), rows(0).getLong(1), rows(0).getLong(2))
    // driver reference: same 4-round synchronous label propagation, then
    // Q = (4m*sum_ec - sum_dc2) / (4m^2) with the same truncating div
    val edges = Graph.copurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      lab = adj.map { case (n, ns) =>
        val counts = ns.map(lab).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val mm = edges.length.toLong
    val sumEc = edges.count { case (a, b) => lab(a) == lab(b) }.toLong
    val dc = adj.toSeq.map { case (n, ns) => lab(n) -> ns.size.toLong }
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).sum }
    val sumDc2 = dc.map(d => d * d).sum
    assert(nc == dc.size.toLong)
    assert(m == mm)
    val expQ = BigInt(1000000) * (BigInt(4) * mm * sumEc - sumDc2) /
      (BigInt(4) * mm * mm)
    assert(qMicro == expQ.toLong, s"q_micro $qMicro != $expQ")
    // sanity: modularity lives in [-0.5, 1]
    assert(qMicro >= -500000L && qMicro <= 1000000L)
  }

  test("x217: weighted pagerank is deterministic and genuinely weight-sensitive") {
    val w = SparkEntry.queries("x217_weighted_pagerank")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val u = Graph.pagerank(li, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet == u.keySet, "same node set as the unweighted rank")
    // every rank respects the teleport floor; mass only shrinks under div
    assert(w.values.forall(r => r >= 150000L && r <= w.size * 1000000L))
    // the multiplicity weights must actually MOVE some ranks (a fixture
    // where every pair co-occurs exactly once would make this vacuous —
    // GraphSpec's x133 test already proves multi-order pairs exist)
    assert(w.exists { case (n, r) => u(n) != r },
      "weighted ranks must differ from unweighted somewhere")
    val again = SparkEntry.queries("x217_weighted_pagerank")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w == again)
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

  test("x133: association rules match driver-computed support/confidence/lift") {
    val baskets = li.select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val n = baskets.size.toLong
    val itemN = baskets.values.flatten.groupBy(identity)
      .map { case (i, xs) => i -> xs.size.toLong }
    val pairN = baskets.values.toSeq
      .flatMap(s => s.toSeq.flatMap(a => s.toSeq.filter(_ != a).map(b => (a, b))))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val got = Graph.associationRules(li, minSup = 2, topN = 100).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b, nab) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nab == pairN((a, b)) && nab >= 2)
      assert(r.getLong(3) == 1000000L * nab / n, "supp_micro")
      assert(r.getLong(4) == 1000L * nab / itemN(a), "conf_milli")
      assert(r.getLong(5) == 1000L * nab * n / (itemN(a) * itemN(b)), "lift_milli")
    }
    // ranked by lift: the list is non-increasing
    val lifts = got.map(_.getLong(5)).toSeq
    assert(lifts == lifts.sorted.reverse)
  }

  test("x134: MAD anomaly flags match a driver-side robust z-score") {
    val ev = graft.Tables(spark, sf001, "events")
    val got = Events.dailyVolumeAnomaly(ev).collect()
    val daily = got.map(r => r.getTimestamp(0) -> r.getLong(1))
    assert(daily.nonEmpty)
    val counts = daily.map(_._2).toSeq
    def rankSel(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted(((sorted.size * 50 + 99) / 100 - 1).toInt)
    }
    val med = rankSel(counts)
    val mad = rankSel(counts.map(c => math.abs(c - med)))
    got.foreach { r =>
      assert(r.getLong(2) == med)
      assert(r.getLong(3) == mad)
      assert(r.getBoolean(4) == (math.abs(r.getLong(1) - med) > 3 * mad))
    }
  }

  test("x135: histogram quantile estimate within one bucket of the exact quantile") {
    val ev = graft.Tables(spark, sf001, "events")
    val got = Events.histogramQuantiles(ev).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(50L, 90L, 99L))
    val values = ev.select("value").collect().map(_.getDouble(0))
    val width = (values.max - values.min) / 1000.0
    got.foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getDouble(2))
      assert(est >= exact - 1e-12 && est <= exact + width + 1e-12,
        s"p${r.getLong(0)}: sketch $est must bracket exact $exact within one bucket")
    }
  }

  test("x137: EWMA equals the driver-side sequential recurrence") {
    val ev = graft.Tables(spark, sf001, "events")
    val got = Events.ewmaDailyVolume(ev).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    assert(got.length > 1)
    assert(got.map(_._1.getTime).toSeq == got.map(_._1.getTime).sorted.toSeq)
    var s = -1L
    got.foreach { case (_, n, e) =>
      s = if (s < 0) n else (7L * s + n) / 8L
      assert(e == s)
    }
  }

  test("x139: hop distances equal a driver-side BFS from the same seed") {
    val edges = Graph.copurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val seed = edges.map(_._1).min
    var dist = Map(seed -> 0L)
    for (_ <- 1 to 4) {
      val grown = dist.toSeq.flatMap { case (n, d) => adj(n).map(_ -> (d + 1)) }
      dist = (dist.toSeq ++ grown).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    val got = Graph.hopDistance(li, hops = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist)
    assert(got(seed) == 0L && got.values.exists(_ > 0))
  }

  test("x242: assortativity equals a driver-side Pearson over edge-end degrees") {
    val edges = Graph.copurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // directed double cover, exact integer moments, same final float steps
    val ends = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .map { case (s, d) => (deg(s), deg(d)) }
    val n = BigInt(ends.length)
    val sa = ends.map(p => BigInt(p._1)).sum
    val sb = ends.map(p => BigInt(p._2)).sum
    val saa = ends.map(p => BigInt(p._1) * p._1).sum
    val sbb = ends.map(p => BigInt(p._2) * p._2).sum
    val sab = ends.map(p => BigInt(p._1) * p._2).sum
    val expected = math.round(
      (n * sab - sa * sb).toDouble /
        (math.sqrt((n * saa - sa * sa).toDouble) *
          math.sqrt((n * sbb - sb * sb).toDouble)) * 1e6)
    val row = SparkEntry.queries("x242_degree_assortativity")(spark, sf001)
      .collect()
    assert(row.length == 1)
    assert(row.head.getLong(0) == ends.length.toLong)
    assert(row.head.getLong(1) == expected)
    // the statistic is a genuine correlation: strictly inside [-1, 1]
    assert(math.abs(row.head.getLong(1)) <= 1000000L)
  }

  test("x243: closeness profile equals a driver-side multi-source BFS") {
    val edges = Graph.copurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val degs = adj.map { case (k, v) => k -> v.size.toLong }
    val seeds = degs.toSeq.sortBy { case (n, d) => (-d, n) }.take(8).map(_._1)
    val expected = seeds.map { seed =>
      var dist = Map(seed -> 0L)
      for (_ <- 1 to 4) {
        val grown = dist.toSeq.flatMap { case (n, d) => adj(n).map(_ -> (d + 1)) }
        dist = (dist.toSeq ++ grown).groupBy(_._1)
          .map { case (n, ds) => n -> ds.map(_._2).min }
      }
      val sumDist = dist.values.sum
      val harmonic = dist.values.filter(_ > 0).map(1000L / _).sum
      val closeness =
        if (sumDist == 0) 0L else 1000L * (dist.size - 1) / sumDist
      seed -> ((dist.size.toLong, sumDist, dist.values.max, closeness,
        harmonic))
    }.toMap
    val got = SparkEntry.queries("x243_closeness_profile")(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected)
    // top-degree seeds by construction; eccentricity bounded by the hops
    assert(got.keySet == seeds.toSet)
    assert(got.values.forall(_._3 <= 4L))
  }

  test("x254: landmark bounds dominate exact distances, tight at landmark endpoints") {
    val got = SparkEntry.queries("x254_landmark_distance")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val edges = Graph.copurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val degs = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val landmarks = degs.toSeq.sortBy { case (n, d) => (-d, n) }
      .take(8).map(_._1).toSet
    got.foreach { case (ua, ub, est, exact) =>
      assert(est >= 0L)
      if (exact >= 0L) {
        assert(est >= exact, s"triangle bound violated for ($ua,$ub)")
        if (landmarks(ua) || landmarks(ub))
          assert(est == exact, s"landmark endpoint must be tight ($ua,$ub)")
      }
    }
    // probes are the top-16 by (deg, id): all pairs among them that share
    // a reaching landmark appear, so landmark-landmark pairs are present
    val lmPairs = got.count { case (ua, ub, _, _) =>
      landmarks(ua) && landmarks(ub) }
    assert(lmPairs > 0, "landmark-landmark pairs must be estimable")
  }

  test("x255: edge churn equals driver-side yearly set algebra") {
    val o = graft.Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byYear = li.select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (o(r.getLong(0)), r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (y, rows) =>
        y -> rows.groupBy(_._2).values.flatMap { order =>
          val parts = order.map(_._3).distinct.sorted
          for (i <- parts.indices; j <- (i + 1) until parts.length)
            yield (parts(i), parts(j))
        }.toSet
      }
    val expected = byYear.keys.toSeq.sorted.flatMap { y =>
      byYear.get(y + 1).map { next =>
        val cur = byYear(y)
        val kept = (cur & next).size.toLong
        (y, y + 1, kept, next.size - kept, cur.size - kept,
          1000L * kept / (cur.size + next.size - kept))
      }
    }
    val got = SparkEntry.queries("x255_graph_evolution")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "fixture orders span multiple years")
  }

  test("x256: hub persistence equals driver-side top-k rank comparison") {
    val o = graft.Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edgesByYear = li.select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (o(r.getLong(0)), r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (y, rows) =>
        y -> rows.groupBy(_._2).values.flatMap { order =>
          val parts = order.map(_._3).distinct.sorted
          for (i <- parts.indices; j <- (i + 1) until parts.length)
            yield (parts(i), parts(j))
        }.toSet
      }
    val topByYear = edgesByYear.map { case (y, es) =>
      val deg = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      y -> deg.toSeq.sortBy { case (n, d) => (-d, n) }.take(32)
        .zipWithIndex.map { case ((n, _), i) => n -> (i + 1L) }.toMap
    }
    val expected = topByYear.keys.toSeq.sorted.flatMap { y =>
      topByYear.get(y + 1).map { next =>
        val cur = topByYear(y)
        val common = cur.keySet & next.keySet
        val carried = common.size.toLong
        val dispSum = common.toSeq.map(n => math.abs(cur(n) - next(n))).sum
        val jac = 1000L * carried / (cur.size + next.size - carried)
        val disp = if (carried == 0) -1L else 1000L * dispSum / carried
        (y, y + 1, carried, jac, disp)
      }
    }
    val got = SparkEntry.queries("x256_hub_persistence")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("x138: textrank reuses the integer pagerank supersteps on the word graph") {
    val d = graft.Tables(spark, sf001, "documents")
    val got = Text.textrankKeywords(d, iters = 4, topK = 50).collect()
    // sf0.001's soup vocabulary is ~31 words — smaller than topK
    assert(got.nonEmpty && got.length <= 50)
    // ranks respect the teleport floor and arrive sorted
    val ranks = got.map(_.getLong(1)).toSeq
    assert(ranks.forall(_ >= 150000L))
    assert(ranks == ranks.sorted.reverse)
    // deterministic across runs (checkpointed supersteps)
    val again = Text.textrankKeywords(d, iters = 4, topK = 50).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(again == got.map(r => (r.getString(0), r.getLong(1))).toSeq)
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

  test("x168: personalized pagerank concentrates on the seed and stays mass-bounded") {
    val rows = SparkEntry.queries("x168_personalized_pagerank")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.nonEmpty)
    // output is rank-desc ordered; the seed is the max-degree node and,
    // with restart mass landing only on it, must hold the top rank
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val e = li.select(org.apache.spark.sql.functions.col("l_orderkey"),
      org.apache.spark.sql.functions.col("l_partkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byOrder = e.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    byOrder.values.foreach { ps =>
      for (a <- ps; b <- ps if a != b)
        adj.getOrElseUpdate(a, scala.collection.mutable.Set()) += b
    }
    val seed = adj.toSeq.map { case (n, s) => (n, s.size) }
      .sortBy { case (n, d) => (-d, n) }.head._1
    assert(rows.head._1 == seed, s"seed $seed must out-rank its neighborhood")
    // total mass: restart injects <= 1.15e6 total across init + 8 rounds;
    // integer truncation only loses mass, so the sum stays under that
    assert(rows.map(_._2).sum <= 1000000L + 8L * 150000L)
    // positive-rank support must be within 8 hops of the seed
    var frontier = Set(seed); var reach = Set(seed)
    for (_ <- 1 to 8) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- reach
      reach ++= frontier
    }
    assert(rows.forall { case (n, _) => reach.contains(n) })
  }

  test("x169: decile bins are equal-frequency within one row and ordered by value") {
    val rows = SparkEntry.queries("x169_decile_bins")(spark, sf001).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, bins) =>
      assert(bins.map(_.getLong(1)).sorted.sameElements(1L to 10L))
      val counts = bins.map(_.getLong(2))
      assert(counts.max - counts.min <= 1, s"ntile balance: ${counts.mkString(",")}")
      val ordered = bins.sortBy(_.getLong(1))
      ordered.sliding(2).foreach { case Array(a, b) =>
        assert(a.getLong(4) <= b.getLong(3) || a.getLong(4) <= b.getLong(4))
      }
    }
  }
}
