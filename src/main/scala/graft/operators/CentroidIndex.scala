package graft.operators

import java.util.concurrent.ConcurrentHashMap

/** Sublinear coarse-quantizer search — the driver-resident structure that
  * removes the last linear-in-k joint from the IVF serving stack. Every
  * stored-index probe selects its nprobe cells by scoring the query
  * against the coarse centroids; scanning all k is fine at fixture k but
  * breaks at production cell counts (k ~ 10⁵–10⁶ for 100-TB corpora,
  * where √N-sized quantizers are the textbook sizing). This object gives
  * cell selection two regimes, the same split FAISS makes between a flat
  * and an HNSW coarse quantizer:
  *
  *   - k ≤ [[ExactScanCeiling]] (or nprobe within a factor of k): exact
  *     linear scan — bit-identical to the historical `selectCells`
  *     arithmetic (cosine, `(-sim, index)` tie-break), and genuinely
  *     optimal at small k where graph traversal overhead exceeds the
  *     scan;
  *   - k above the ceiling: a deterministic in-memory HNSW graph
  *     (Malkov & Yashunin 2016, arXiv:1603.09320) over the centroids —
  *     build O(k·M·efConstruction), search O(ef·M) distance evaluations
  *     ~ logarithmic in k, independent of corpus size.
  *
  * Determinism is load-bearing: the batch≡single probe equality specs pin
  * that every probe path chooses the SAME cells for the same query, so
  * the graph must be a pure function of the centroid array. Construction
  * inserts nodes in id order, assigns levels from a SplitMix64 hash of
  * the node id (no RNG state), and breaks every heap/selection tie by
  * node id. Two builds over equal centroids are structurally identical;
  * CentroidIndexSpec pins it.
  *
  * Graphs are cached by a 64-bit content fingerprint of the centroid
  * array, NOT by index path: compaction rewrites centroids in place in
  * the plain (non-manifest) layout, and a content key can never serve a
  * stale graph for refreshed centroids. The per-call fingerprint is one
  * multiply-xor pass over k·dim doubles — far cheaper than the
  * dot+sqrt+sort scan it replaces — and the O(k·M·ef) build amortizes
  * across every probe of the same generation. The cache holds graph
  * topology only (k·M ints), bounded by [[CacheCeiling]] entries.
  *
  * Approximation contract: the graph regime is approximate by design
  * (that is the price of sublinearity — FAISS's IVF_HNSW pays the same);
  * CentroidIndexSpec gates cell-selection recall ≥ 0.95 against the
  * exact argmin at k = 2048. Both regimes go through ONE public
  * [[select]] so no probe path can drift from the pinned ordering.
  */
object CentroidIndex {

  /** Below this k, exact scan wins outright (graph overhead > scan). */
  val ExactScanCeiling = 1024

  /** Graph degree (M): neighbors kept per node per layer; layer 0 keeps
    * 2M. 16 is the HNSW paper's robust default.
    */
  val Degree = 16

  /** Candidate-list width during construction. */
  val EfConstruction = 200

  /** Search floor: ef = max(this, 4·nprobe) so small nprobe still
    * explores enough of the graph to hit the recall gate.
    */
  val EfSearchFloor = 64

  /** Max cached graphs; crude bound, each entry is k·M ints. */
  val CacheCeiling = 64

  private val cache = new ConcurrentHashMap[Long, Hnsw]()

  /** Cell selection for every IVF probe: top-`nprobe` centroid indices by
    * cosine(q, centroid) under the `(-sim, index)` tie-break — exact below
    * the ceiling, graph-searched above it.
    */
  def select(coarse: Seq[Array[Double]], qvec: Array[Double], qnorm: Double,
      nprobe: Int): Seq[Int] = {
    val k = coarse.length
    if (k <= ExactScanCeiling || nprobe * 4 >= k)
      selectExact(coarse, qvec, qnorm, nprobe)
    else graphOf(coarse).select(qvec, qnorm, nprobe)
  }

  /** The historical linear scan, verbatim — the exact-regime definition
    * AND the recall oracle the graph regime is gated against.
    */
  def selectExact(coarse: Seq[Array[Double]], qvec: Array[Double],
      qnorm: Double, nprobe: Int): Seq[Int] =
    coarse.zipWithIndex
      .map { case (c, j) => j -> dot(qvec, c) / (qnorm * math.sqrt(dot(c, c))) }
      .sortBy { case (j, sim) => (-sim, j) }
      .take(nprobe).map(_._1)

  /** The (content-cached) HNSW graph for a centroid array; public so the
    * spec can exercise the graph regime below the ceiling.
    */
  def graphOf(coarse: Seq[Array[Double]]): Hnsw = {
    val key = fingerprint(coarse)
    val hit = cache.get(key)
    if (hit != null && hit.size == coarse.length) hit
    else {
      val g = Hnsw.build(coarse.toArray)
      if (cache.size >= CacheCeiling) cache.clear()
      cache.put(key, g)
      g
    }
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var i = 0; var d = 0.0
    while (i < a.length) { d += a(i) * b(i); i += 1 }
    d
  }

  /** SplitMix64-mixed content hash of the centroid array (dims and k
    * folded in). One pass, no allocation.
    */
  private def fingerprint(coarse: Seq[Array[Double]]): Long = {
    var h = mix64(coarse.length.toLong * 31 + (if (coarse.isEmpty) 0 else coarse.head.length))
    coarse.foreach { c =>
      var i = 0
      while (i < c.length) {
        h = mix64(h ^ java.lang.Double.doubleToLongBits(c(i)))
        i += 1
      }
    }
    h
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic HNSW over a fixed centroid array. Distances are
    * negative cosine (centroid norms precomputed once); every ordering
    * ties on node id so the structure and the search result are pure
    * functions of the input.
    */
  final class Hnsw private (vecs: Array[Array[Double]], norms: Array[Double],
      levels: Array[Int], neighbors: Array[Array[Array[Int]]],
      entry: Int, maxLevel: Int) {

    def size: Int = vecs.length

    /** Serialization surface for the sharded full-vector tier
      * ([[graft.queries.HnswAnn]]): per-node layer adjacency (index 0 =
      * layer 0), entry point and top layer. Levels are implicit —
      * `exportNeighbors(i).length - 1` — so the stored graph is one
      * nested-array column. Arrays are the live internals; callers treat
      * them as read-only.
      */
    def exportNeighbors: Array[Array[Array[Int]]] = neighbors
    def entryPoint: Int = entry
    def topLevel: Int = maxLevel

    /** Top-`k` (id, cosine) for a query, ordered by `(-sim, id)` — the
      * full-vector serving search: same traversal as [[select]], but
      * returning the scores (exact cosines of the visited candidates, so
      * returned scores are bit-identical to a brute-force scoring of the
      * same ids) and an explicit `ef` floor.
      */
    def searchTop(qvec: Array[Double], qnorm: Double, k: Int,
        ef: Int): Array[(Int, Double)] = {
      var cur = entry
      var lvl = maxLevel
      while (lvl > 0) {
        cur = greedyClosest(qvec, qnorm, cur, lvl)
        lvl -= 1
      }
      searchLayer(qvec, qnorm, cur, math.max(ef, k), 0)
        .sortBy { case (id, d) => (d, id) }.take(k)
        .map { case (id, d) => (id, -d) }
    }

    /** Top-`nprobe` cells for a query, ordered by `(-sim, id)` — the
      * shared probe contract.
      */
    def select(qvec: Array[Double], qnorm: Double, nprobe: Int): Seq[Int] = {
      val ef = math.max(EfSearchFloor, 4 * nprobe)
      var cur = entry
      var lvl = maxLevel
      while (lvl > 0) {
        cur = greedyClosest(qvec, qnorm, cur, lvl)
        lvl -= 1
      }
      val cand = searchLayer(qvec, qnorm, cur, ef, 0)
      cand.sortBy { case (id, d) => (d, id) }.take(nprobe).map(_._1).toSeq
    }

    private def qdist(q: Array[Double], qnorm: Double, id: Int): Double = {
      var i = 0; var d = 0.0
      val v = vecs(id)
      while (i < v.length) { d += q(i) * v(i); i += 1 }
      -(d / (qnorm * norms(id)))
    }

    private def greedyClosest(q: Array[Double], qnorm: Double, start: Int,
        lvl: Int): Int = {
      var cur = start
      var curD = qdist(q, qnorm, cur)
      var improved = true
      while (improved) {
        improved = false
        val ns = neighbors(cur)(lvl)
        var i = 0
        while (i < ns.length) {
          val d = qdist(q, qnorm, ns(i))
          if (d < curD || (d == curD && ns(i) < cur)) {
            curD = d; cur = ns(i); improved = true
          }
          i += 1
        }
      }
      cur
    }

    /** Best-first ef-search on one layer; returns (id, dist) of the ef
      * closest found. Heaps order by (dist, id) for determinism.
      */
    private[operators] def searchLayer(q: Array[Double], qnorm: Double,
        start: Int, ef: Int, lvl: Int): Array[(Int, Double)] = {
      implicit val byDistId: Ordering[(Double, Int)] = Ordering.Tuple2
      val visited = new java.util.HashSet[Integer]()
      // candidates: min-heap by dist (scala PQ is max-heap → reverse)
      val candidates = scala.collection.mutable.PriorityQueue
        .empty[(Double, Int)](byDistId.reverse)
      // found: max-heap by dist, bounded at ef
      val found = scala.collection.mutable.PriorityQueue.empty[(Double, Int)]
      val d0 = qdist(q, qnorm, start)
      visited.add(start)
      candidates.enqueue((d0, start))
      found.enqueue((d0, start))
      while (candidates.nonEmpty) {
        val (cd, c) = candidates.dequeue()
        if (cd > found.head._1) candidates.clear() // all remaining are farther
        else {
          val ns = neighbors(c)(lvl)
          var i = 0
          while (i < ns.length) {
            val n = ns(i)
            if (visited.add(n)) {
              val d = qdist(q, qnorm, n)
              if (found.size < ef || byDistId.lt((d, n), found.head)) {
                candidates.enqueue((d, n))
                found.enqueue((d, n))
                if (found.size > ef) found.dequeue()
              }
            }
            i += 1
          }
        }
      }
      found.toArray.map { case (d, id) => (id, d) }
    }
  }

  object Hnsw {

    /** Rebuild a graph from its serialized form (vectors + per-node layer
      * adjacency + entry/top) — the read side of the stored sharded-HNSW
      * tier. Norms are recomputed (cheaper than storing, and keeps the
      * stored schema to one nested column); search through a restored
      * graph is bit-identical to search through the built one
      * (HnswAnnSpec pins it).
      */
    def restore(vecs: Array[Array[Double]],
        neighbors: Array[Array[Array[Int]]], entry: Int,
        maxLevel: Int): Hnsw = {
      val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
      new Hnsw(vecs, norms, neighbors.map(_.length - 1), neighbors, entry,
        maxLevel)
    }

    /** Deterministic construction: nodes inserted in id order, level from
      * a SplitMix64 hash of the id, neighbor sets from the paper's
      * select-neighbors heuristic (keep a candidate only if it is closer
      * to the new node than to every already-kept neighbor — the
      * clustered-data connectivity fix), bidirectional links shrunk by
      * the same heuristic.
      */
    def build(vecs: Array[Array[Double]]): Hnsw = {
      val k = vecs.length
      require(k > 0, "empty centroid array")
      val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
      val mL = 1.0 / math.log(Degree.toDouble)
      val levels = Array.tabulate(k) { i =>
        // u in (0,1] from the id hash; floor(-ln(u)·mL) — the paper's
        // geometric level draw, made a pure function of the id
        val u = ((mix64(i.toLong) >>> 11) + 1).toDouble / (1L << 53).toDouble
        math.floor(-math.log(u) * mL).toInt
      }
      val nbr = Array.tabulate(k) { i =>
        Array.fill(levels(i) + 1)(
          scala.collection.mutable.ArrayBuffer.empty[Int])
      }

      def dist(a: Int, b: Int): Double = {
        val va = vecs(a); val vb = vecs(b)
        var i = 0; var d = 0.0
        while (i < va.length) { d += va(i) * vb(i); i += 1 }
        -(d / (norms(a) * norms(b)))
      }

      // select-neighbors heuristic (paper Alg. 4, no pruned-connection
      // re-add): candidates ascending by (dist-to-base, id); keep e iff
      // it is closer to base than to every kept neighbor
      def selectHeuristic(base: Int, cand: Seq[(Int, Double)],
          m: Int): Seq[Int] = {
        val sorted = cand.sortBy { case (id, d) => (d, id) }
        val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
        val it = sorted.iterator
        while (it.hasNext && kept.length < m) {
          val (e, dBase) = it.next()
          if (kept.forall(r => dist(e, r) > dBase)) kept += e
        }
        // fall back to plain nearest if the heuristic kept too few
        if (kept.length < m) {
          val have = kept.toSet
          sorted.iterator.filterNot { case (id, _) => have(id) }
            .take(m - kept.length).foreach { case (id, _) => kept += id }
        }
        kept.toSeq
      }

      def maxDeg(lvl: Int): Int = if (lvl == 0) 2 * Degree else Degree

      var entry = 0
      var maxLevel = levels(0)

      // one tiny shim so insertion can reuse the search: build a facade
      // over the mutable buffers
      def searchLayerB(q: Array[Double], qn: Double, start: Int, ef: Int,
          lvl: Int): Array[(Int, Double)] = {
        implicit val byDistId: Ordering[(Double, Int)] = Ordering.Tuple2
        def qd(id: Int): Double = {
          val v = vecs(id)
          var i = 0; var d = 0.0
          while (i < v.length) { d += q(i) * v(i); i += 1 }
          -(d / (qn * norms(id)))
        }
        val visited = new java.util.HashSet[Integer]()
        val candidates = scala.collection.mutable.PriorityQueue
          .empty[(Double, Int)](byDistId.reverse)
        val found = scala.collection.mutable.PriorityQueue.empty[(Double, Int)]
        val d0 = qd(start)
        visited.add(start)
        candidates.enqueue((d0, start))
        found.enqueue((d0, start))
        while (candidates.nonEmpty) {
          val (cd, c) = candidates.dequeue()
          if (cd > found.head._1) candidates.clear()
          else {
            val ns = nbr(c)(lvl)
            var i = 0
            while (i < ns.length) {
              val n = ns(i)
              if (visited.add(n)) {
                val d = qd(n)
                if (found.size < ef || byDistId.lt((d, n), found.head)) {
                  candidates.enqueue((d, n))
                  found.enqueue((d, n))
                  if (found.size > ef) found.dequeue()
                }
              }
              i += 1
            }
          }
        }
        found.toArray.map { case (d, id) => (id, d) }
      }

      var node = 1
      while (node < k) {
        val lvl = levels(node)
        var cur = entry
        // greedy descent through layers above the node's level
        var l = maxLevel
        while (l > lvl) {
          var improved = true
          while (improved) {
            improved = false
            val ns = nbr(cur)(l)
            var best = cur
            var bestD = dist(node, cur)
            var i = 0
            while (i < ns.length) {
              val d = dist(node, ns(i))
              if (d < bestD || (d == bestD && ns(i) < best)) {
                bestD = d; best = ns(i); improved = true
              }
              i += 1
            }
            cur = best
          }
          l -= 1
        }
        // connect on layers min(maxLevel, lvl)..0
        var layer = math.min(maxLevel, lvl)
        while (layer >= 0) {
          val cand = searchLayerB(vecs(node), norms(node), cur, EfConstruction, layer)
          val chosen = selectHeuristic(node, cand.toSeq, Degree)
          chosen.foreach { c =>
            nbr(node)(layer) += c
            nbr(c)(layer) += node
            if (nbr(c)(layer).length > maxDeg(layer)) {
              val shrunk = selectHeuristic(c,
                nbr(c)(layer).toSeq.map(x => x -> dist(c, x)), maxDeg(layer))
              nbr(c)(layer).clear()
              nbr(c)(layer) ++= shrunk
            }
          }
          // continue the descent from the closest found candidate
          if (cand.nonEmpty) cur = cand.minBy { case (id, d) => (d, id) }._1
          layer -= 1
        }
        if (lvl > maxLevel) { maxLevel = lvl; entry = node }
        node += 1
      }

      new Hnsw(vecs, norms, levels, nbr.map(_.map(_.toArray)), entry, maxLevel)
    }
  }
}
