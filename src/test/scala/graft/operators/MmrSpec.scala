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

  test("x377 integer twin: a BigInt-exact milli-score replay reproduces the shared greedy") {
    // the twin feeds 24-bit md5 integers through the SAME mmrGreedy loop
    // x92 runs, with λ-arithmetic in doubles (0.7·rel − 0.3·maxSim).
    // Integer-valued doubles below 2^53 make that arithmetic exact, so an
    // all-integer replay (700·rel − 300·maxSim in BigInt, no floats
    // anywhere) must reproduce the pick sequence bit-for-bit — the pin
    // that the double path loses nothing on integer scores.
    def relOf(i: Long) = BigInt(java.security.MessageDigest.getInstance("MD5")
      .digest(s"rel:$i".getBytes("UTF-8")).take(3).map("%02x".format(_)).mkString, 16)
    def simOf(a: Long, b: Long) = {
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(s"sim:$lo:$hi".getBytes("UTF-8")).take(3).map("%02x".format(_)).mkString, 16)
    }
    val ids = (0L until 24L).sortBy(i => (-relOf(i), i))
    val n = ids.length
    val maxSim = Array.fill(n)(BigInt(0))
    val in = Array.fill(n)(false)
    val picked = scala.collection.mutable.ArrayBuffer[Long]()
    while (picked.length < 8) {
      var best = -1; var bestScore: Option[BigInt] = None
      for (i <- 0 until n if !in(i)) {
        val score = if (picked.isEmpty) 1000 * relOf(ids(i))
          else 700 * relOf(ids(i)) - 300 * maxSim(i)
        if (bestScore.forall(score > _)) { best = i; bestScore = Some(score) }
      }
      in(best) = true
      picked += ids(best)
      for (i <- 0 until n if !in(i))
        maxSim(i) = maxSim(i).max(simOf(ids(i), ids(best)))
    }
    val got = graft.SparkEntry.queries("x377_mmr_rerank_exact")(spark, sf001)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got == picked.toSeq,
      s"integer-exact replay diverged from the shared greedy: $got vs $picked")
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
