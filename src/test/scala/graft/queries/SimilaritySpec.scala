package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Recall checks for the approximate similarity paths against the exact
  * brute-force baseline (their correctness gate — no SQL oracle exists for
  * hash/probe-seeded algorithms).
  */
class SimilaritySpec extends SparkSpec {

  private lazy val exactTop20: Set[Long] =
    SparkEntry.queries("x06_cosine_topk")(spark, sf001)
      .collect().map(_.getLong(0)).toSet

  test("LSH ANN recalls a usable fraction of the exact top-20") {
    val ann = SparkEntry.queries("x07_ann_lsh_topk")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    assert(ann.size == 20)
    val recall = (ann & exactTop20).size / 20.0
    assert(recall >= 0.25, s"LSH recall collapsed: $recall")
  }

  test("IVF ANN recalls a usable fraction of the exact top-20") {
    val ivf = SparkEntry.queries("x07b_ann_ivf_topk")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.size == 20)
    val recall = (ivf & exactTop20).size / 20.0
    assert(recall >= 0.25, s"IVF recall collapsed: $recall")
  }

  test("approximate results are subsets of valid similarity ordering") {
    // every ANN hit's similarity must be <= the exact best similarity
    val exactBest = SparkEntry.queries("x06_cosine_topk")(spark, sf001)
      .collect().map(_.getDouble(1)).max
    val ivfBest = SparkEntry.queries("x07b_ann_ivf_topk")(spark, sf001)
      .collect().map(_.getDouble(1)).max
    assert(ivfBest <= exactBest + 1e-12)
  }
}
