package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the sublinear coarse-quantizer search (CentroidIndex):
  * graph-regime recall against the exact argmin, determinism of the
  * deterministic-HNSW construction, exact-regime bit-identity with the
  * historical linear scan, and the content-fingerprint cache. The probe
  * integration (plan constant in k, batch≡single through the shared
  * selection) is pinned in StoredAnnSpec/PlanRobustnessSpec.
  */
class CentroidIndexSpec extends AnyFunSuite {

  /** Deterministic clustered vectors: `nClusters` Gaussian centers, each
    * centroid a jittered copy — the shape a k-means coarse quantizer
    * actually has (NOT uniform noise, where near-ties make approximate
    * search artificially hard and meaninglessly easy to grade).
    */
  private def mkCentroids(k: Int, dim: Int, nClusters: Int,
      seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian() * 4.0))
    Array.tabulate(k) { i =>
      val c = centers(i % nClusters)
      c.map(_ + rnd.nextGaussian() * 0.5)
    }
  }

  private def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)

  test("graph regime: cell-selection recall >= 0.95 against the exact argmin at k=2048") {
    val k = 2048
    val coarse = mkCentroids(k, dim = 16, nClusters = 64, seed = 7L).toSeq
    val rnd = new scala.util.Random(11L)
    val nprobe = 8
    var hit = 0; var tot = 0
    for (_ <- 0 until 200) {
      val q = Array.fill(16)(rnd.nextGaussian() * 4.0)
      val qn = norm(q)
      // k > ExactScanCeiling and nprobe*4 << k: select() routes to the graph
      val got = CentroidIndex.select(coarse, q, qn, nprobe).toSet
      val exact = CentroidIndex.selectExact(coarse, q, qn, nprobe).toSet
      hit += got.intersect(exact).size
      tot += nprobe
    }
    val recall = hit.toDouble / tot
    assert(recall >= 0.95, s"graph cell-selection recall $recall < 0.95")
  }

  test("determinism: two independent builds select identical cells for every query") {
    val coarse = mkCentroids(512, dim = 8, nClusters = 16, seed = 3L)
    val g1 = CentroidIndex.Hnsw.build(coarse)
    val g2 = CentroidIndex.Hnsw.build(coarse.map(_.clone()))
    val rnd = new scala.util.Random(5L)
    for (_ <- 0 until 50) {
      val q = Array.fill(8)(rnd.nextGaussian())
      val qn = norm(q)
      assert(g1.select(q, qn, 6) == g2.select(q, qn, 6),
        "independent builds over equal centroids must search identically")
    }
  }

  test("exact regime: below the ceiling, select() is bit-identical to the linear scan") {
    val coarse = mkCentroids(100, dim = 8, nClusters = 10, seed = 13L).toSeq
    val rnd = new scala.util.Random(17L)
    for (_ <- 0 until 50) {
      val q = Array.fill(8)(rnd.nextGaussian())
      val qn = norm(q)
      assert(CentroidIndex.select(coarse, q, qn, 4) ==
        CentroidIndex.selectExact(coarse, q, qn, 4))
    }
  }

  test("wide-nprobe fallback: nprobe within a factor of k routes to the exact scan") {
    // k=2000 > ceiling but nprobe*4 >= k — graph search cannot cover a
    // majority of the index better than the scan, so select() must not try
    val coarse = mkCentroids(2000, dim = 4, nClusters = 8, seed = 23L).toSeq
    val q = Array.fill(4)(1.0)
    val got = CentroidIndex.select(coarse, q, 2.0, 600)
    assert(got == CentroidIndex.selectExact(coarse, q, 2.0, 600))
  }

  test("content cache: equal centroid arrays share one graph; changed content rebuilds") {
    val a = mkCentroids(1500, dim = 8, nClusters = 12, seed = 31L)
    val b = a.map(_.clone()) // equal content, distinct identity
    val ga = CentroidIndex.graphOf(a.toSeq)
    val gb = CentroidIndex.graphOf(b.toSeq)
    assert(ga eq gb, "equal-content centroid arrays must share one cached graph")
    val c = a.map(_.clone())
    c(0)(0) += 1.0
    val gc = CentroidIndex.graphOf(c.toSeq)
    assert(!(gc eq ga), "changed centroid content must not serve the stale graph")
  }
}
