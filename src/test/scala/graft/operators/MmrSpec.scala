package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for MMR diversified re-rank (x92): the λ = 1 reduction to plain
  * top-k, the coverage win on a planted clustered corpus, and
  * deterministic serving.
  */
class MmrSpec extends SparkSpec {

  // three tight clusters in 6 dims; the query sits on cluster 0's axis,
  // so plain top-k is all-cluster-0 while MMR must reach the others
  private def planted = {
    import spark.implicits._
    (0 until 30).map { i =>
      val c = i / 10
      val v = Array.tabulate(6) { d =>
        (if (d == 2 * c) 1.0 else 0.02) + 0.001 * (i % 10) * (d + 1)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def candidates = {
    import graft.queries.Similarity
    val q = Array(1.0, 0.0, 0.3, 0.0, 0.3, 0.0)
    planted.select(col("vec_id"),
      graft.functions.VectorOps.cosine(col("embedding"), typedLit(q)).as("sim"))
  }

  test("lambda = 1 reduces MMR to the plain top-k of the candidates") {
    import graft.queries.Similarity
    val plain = candidates.orderBy(col("sim").desc, col("vec_id"))
      .limit(8).collect().map(_.getLong(0)).toSeq
    val mmr = Similarity.mmrRerank(spark, candidates, planted,
        k = 8, lambda = 1.0, topC = 30)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(mmr == plain, s"λ=1 must be the identity re-rank: $mmr vs $plain")
  }

  test("low lambda buys cluster coverage the plain top-k does not have") {
    import graft.queries.Similarity
    def clustersOf(ids: Seq[Long]): Set[Long] = ids.map(_ / 10).toSet
    val plain = candidates.orderBy(col("sim").desc, col("vec_id"))
      .limit(6).collect().map(_.getLong(0)).toSeq
    assert(clustersOf(plain) == Set(0L),
      s"the planted geometry must make plain top-6 single-cluster: $plain")
    val mmr = Similarity.mmrRerank(spark, candidates, planted,
        k = 6, lambda = 0.5, topC = 30)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(clustersOf(mmr) == Set(0L, 1L, 2L),
      s"MMR at λ=0.5 must cover all three planted clusters: $mmr")
    assert(mmr.head == plain.head,
      "the first MMR pick is always the most relevant candidate")
  }

  test("x92 registry entry serves a diversified top-20 deterministically") {
    val got = graft.SparkEntry.queries("x92_ann_mmr_rerank")(spark, sf001).collect()
    assert(got.length == 20, s"top-20, got ${got.length}")
    assert(got.map(_.getLong(0)).toSeq == (0L until 20L).toSeq,
      "ranks are dense 0..19 in order")
    assert(!got.map(_.getLong(1)).contains(0L), "the query vector is excluded")
    assert(got.map(_.getLong(1)).distinct.length == 20, "no repeated picks")
    val again = graft.SparkEntry.queries("x92_ann_mmr_rerank")(spark, sf001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
