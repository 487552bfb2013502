package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the recall-evaluation harness (x95): the self-recall
  * identity, hand-computed overlap counts, missing-query zeros, and the
  * registry entry's recall floor on the stored IVF tier.
  */
class RecallEvalSpec extends SparkSpec {

  test("recall counts are exact set-overlap per query, zero-filled for missed queries") {
    import spark.implicits._
    import graft.queries.Similarity
    val exact = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 7L), (2L, 8L), (2L, 9L))
      .toDF("q_id", "vec_id")
    val approx = Seq(
      (0L, 1L), (0L, 2L), (0L, 99L), // 2/3
      (1L, 4L), (1L, 5L), (1L, 6L)) // 3/3; query 2 absent entirely
      .toDF("q_id", "vec_id")
    val r = Similarity.recallAtK(approx, exact, k = 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(0L -> ((2L, 3L)), 1L -> ((3L, 3L)), 2L -> ((0L, 3L))),
      s"exact overlap accounting: $r")
  }

  test("self-recall is k/k for every query") {
    import spark.implicits._
    import graft.queries.Similarity
    val exact = (0L until 4L).flatMap(q => (0L until 5L).map(i => (q, q * 10 + i)))
      .toDF("q_id", "vec_id")
    val r = Similarity.recallAtK(exact, exact, k = 5).collect()
    assert(r.length == 4 && r.forall(x => x.getLong(1) == 5L),
      "a result set scored against itself recalls everything")
  }

  test("x95 registry entry: stored-IVF recall@10 monitored per query on the fixture") {
    val got = graft.SparkEntry.queries("x95_ann_recall_eval")(spark, sf001).collect()
    assert(got.map(_.getLong(0)).toSet == (0L until 8L).toSet,
      "one recall row per batch query")
    // the monitor reports truth, the gate encodes the serving SLO: no
    // query below 6/10 at nprobe = 6, batch mean >= 0.8 (the repo's
    // probe conventions; fixture measures one query at 7/10)
    got.foreach { r =>
      assert(r.getLong(2) == 10L)
      assert(r.getLong(1) >= 6L,
        s"query ${r.getLong(0)}: recall ${r.getLong(1)}/10 below the per-query SLO")
    }
    val mean = got.map(_.getLong(1)).sum / (10.0 * got.length)
    assert(mean >= 0.8, s"batch mean recall $mean below the SLO")
    val again = graft.SparkEntry.queries("x95_ann_recall_eval")(spark, sf001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("x376 SQ8 twin: recall matches a driver-side BigInt replay of both tiers") {
    // independent driver-side replay of both tiers: the SQ8 side ranks by
    // an integer dot product (exact by construction, Long arithmetic
    // here), the exact side by a straightforward left-to-right double
    // cosine — the same accumulation order as the native kernel, written
    // independently of it. The per-query intersection sizes must match
    // the registry row exactly.
    val e = graft.Tables(spark, sf001, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) as emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def quant(v: Array[Double]): Array[Long] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => math.floor(127.0 * x / n + 0.5).toLong)
    }
    def idot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val zs = e.map { case (id, v) => id -> quant(v) }
    val expected = (0L until 8L).map { qid =>
      val others = e.keys.filter(_ != qid).toSeq
      val aTop = others.sortBy(id => (-idot(zs(id), zs(qid)), id)).take(10).toSet
      val eTop = others.sortBy(id => (-cos(e(id), e(qid)), id)).take(10).toSet
      qid -> (aTop & eTop).size.toLong
    }.toMap
    val got = graft.SparkEntry.queries("x376_ann_recall_sq8_exact")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"recall map diverged: $got vs $expected")
  }

  test("x397: Kendall tau pair counts replay from independent tier recomputes") {
    val e = graft.Tables(spark, sf001, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) as emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def quant(v: Array[Double]): Array[Long] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => math.floor(127.0 * x / n + 0.5).toLong)
    }
    def idot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val zs = e.map { case (id, v) => id -> quant(v) }
    val got = graft.SparkEntry.queries("x397_rank_tau_sq8_exact")(spark, sf001)
      .collect().map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("n_common"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("concordant"), r.getAs[Long]("discordant"))).toMap
    (0L until 8L).foreach { qid =>
      val others = e.keys.filter(_ != qid).toSeq
      val aTop = others.sortBy(id => (-idot(zs(id), zs(qid)), id)).take(10)
      val eTop = others.sortBy(id => (-cos(e(id), e(qid)), id)).take(10)
      val pa = aTop.zipWithIndex.toMap
      val pe = eTop.zipWithIndex.toMap
      val common = aTop.filter(pe.contains).sorted
      val pairs = for {
        i <- common.indices; j <- (i + 1) until common.length
      } yield (common(i), common(j))
      val conc = pairs.count { case (a, b) =>
        (pa(a) < pa(b)) == (pe(a) < pe(b)) }
      val disc = pairs.size - conc
      assert(got(qid) == ((common.size.toLong, pairs.size.toLong,
        conc.toLong, disc.toLong)), s"tau pair replay diverged for $qid")
    }
    // tau is bounded and consistent with its own counts under the
    // sign-split integer division
    for (r <- graft.SparkEntry.queries("x397_rank_tau_sq8_exact")(spark, sf001)
        .collect() if r.getAs[Long]("n_pairs") > 0) {
      val (c, d) = (r.getAs[Long]("concordant"), r.getAs[Long]("discordant"))
      val tau = r.getAs[Long]("tau_milli")
      val expect = if (c >= d) 1000L * (c - d) / (c + d)
        else -(1000L * (d - c) / (c + d))
      assert(tau == expect && tau >= -1000L && tau <= 1000L)
    }
  }

  test("x385/x386: ladder DCG and reciprocal ranks replay from independent tier recomputes") {
    val e = graft.Tables(spark, sf001, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) as emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def quant(v: Array[Double]): Array[Long] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => math.floor(127.0 * x / n + 0.5).toLong)
    }
    def idot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val disc = Array(1000000L, 630929L, 500000L, 430676L, 386852L,
      356207L, 333333L, 315464L, 301029L, 289064L)
    val zs = e.map { case (id, v) => id -> quant(v) }
    val ndcgRows = graft.SparkEntry.queries("x385_ndcg_sq8_exact")(spark, sf001)
      .collect().map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("dcg_micro"), r.getAs[Long]("idcg_micro"),
          r.getAs[Long]("ndcg_milli"))).toMap
    val mrrRows = graft.SparkEntry.queries("x386_mrr_sq8_exact")(spark, sf001)
      .collect().map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("first_hit_rank"), r.getAs[Long]("rr_micro"))).toMap
    var rrSum = 0L
    (0L until 8L).foreach { qid =>
      val others = e.keys.filter(_ != qid).toSeq
      val aTop = others.sortBy(id => (-idot(zs(id), zs(qid)), id)).take(10)
      val eTop = others.sortBy(id => (-cos(e(id), e(qid)), id)).take(10)
      val grade = eTop.zipWithIndex.map { case (id, i) =>
        id -> (if (i < 3) 3L else if (i < 5) 2L else 1L)
      }.toMap
      val dcg = aTop.zipWithIndex.map { case (id, i) =>
        grade.getOrElse(id, 0L) * disc(i) }.sum
      val idcg = eTop.zipWithIndex.map { case (id, i) =>
        grade(id) * disc(i) }.sum
      assert(ndcgRows(qid) == ((dcg, idcg, 1000L * dcg / idcg)),
        s"nDCG replay diverged for query $qid")
      val hit = aTop.zipWithIndex.collectFirst {
        case (id, i) if grade.getOrElse(id, 0L) == 3L => i + 1L
      }
      val rr = hit.map(1000000L / _).getOrElse(0L)
      rrSum += rr
      assert(mrrRows(qid) == ((hit.getOrElse(0L), rr)),
        s"MRR replay diverged for query $qid")
    }
    val mrr = graft.SparkEntry.queries("x386_mrr_sq8_exact")(spark, sf001)
      .collect().map(_.getAs[Long]("mrr_micro")).distinct
    assert(mrr.toSeq == Seq(rrSum / 8L), "the repeated batch-mean column must be the exact mean")
  }
}
