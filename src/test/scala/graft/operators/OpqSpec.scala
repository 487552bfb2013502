package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.Similarity
import org.apache.spark.sql.functions._

/** Gates for OPQ (learned-rotation PQ): the x70-discipline STRICT
  * reconstruction-error win over raw PQ at the same code budget, rotation
  * orthogonality, the monotone objective trace, and bit-identity of the
  * batch serving path through the rotated index.
  */
class OpqSpec extends SparkSpec {

  private lazy val vecs =
    Tables(spark, sf001, "embeddings").select(col("vec_id"), col("embedding"))

  private lazy val trained = Opq.train(vecs, m = 8, k = 16, pqIters = 2, opqIters = 3)

  test("strict MSE win over raw PQ at the same (m, k) budget") {
    val (model, cb, trace) = trained
    val rawCb = ProductQuantizer.train(vecs, m = 8, k = 16, iters = 2)
    val eye = Opq.Model(model.dim,
      Array.tabulate(model.dim * model.dim)(i =>
        if (i / model.dim == i % model.dim) 1.0 else 0.0))
    val rawMse = Opq.mse(vecs, eye, rawCb)
    val opqMse = Opq.mse(vecs, model, cb)
    assert(opqMse < rawMse,
      s"OPQ must strictly beat raw PQ: opq=$opqMse raw=$rawMse")
    // trace entry 0 IS raw PQ (R starts at identity): the alternation's
    // monotone non-increase is the algorithm's own correctness witness
    assert(math.abs(trace.head.mse - rawMse) / rawMse < 1e-9,
      s"trace(0)=${trace.head.mse} must equal raw PQ's MSE $rawMse (R0 = I)")
    for (i <- 1 until trace.length)
      assert(trace(i).mse <= trace(i - 1).mse * (1 + 1e-9),
        s"objective must not increase: trace=$trace")
    // rotation deltas: 0 entering iteration 0 (R0 = I), a real update
    // entering iteration 1 (the Procrustes step moved the frame)
    assert(trace.head.rotDelta == 0.0)
    assert(trace(1).rotDelta > 0.0, s"Procrustes must move R: $trace")
  }

  test("opq_trace artifact beside the index is the queryable convergence record") {
    val e = Tables(spark, sf001, "embeddings")
    val store = graft.StoredArtifacts.dir(sf001, "ivfopq_index_v2")
    if (!graft.StoredArtifacts.ready(s"$store/codes"))
      Similarity.writeIvfOpqIndex(e, store, iters = 2, m = 8, kSub = 16, opqIters = 3)
    val rows = spark.read.parquet(s"$store/opq_trace")
      .orderBy("iter")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2))
    for (i <- 1 until rows.length)
      assert(rows(i)._2 <= rows(i - 1)._2 * (1 + 1e-9),
        s"stored trace must be monotone: ${rows.toSeq}")
    assert(rows(0)._3 == 0.0 && rows(1)._3 > 0.0,
      s"stored rot_delta must record the Procrustes updates: ${rows.toSeq}")
  }

  test("learned rotation is orthogonal: R'R = I to 1e-9") {
    val (model, _, _) = trained
    val d = model.dim
    for (i <- 0 until d; j <- 0 until d) {
      var s = 0.0
      for (l <- 0 until d) s += model.flat(l * d + i) * model.flat(l * d + j)
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(s - expect) < 1e-9,
        s"R'R[$i][$j] = $s, expected $expect")
    }
  }

  test("driver rotate and column rotate agree bit-for-bit") {
    val (model, _, _) = trained
    val rows = vecs.limit(16)
      .select(col("embedding").cast("array<double>"),
        model.rotateCol(col("embedding")))
      .collect()
    for (r <- rows) {
      val x = r.getSeq[Double](0).toArray
      val viaCol = r.getSeq[Double](1).toArray
      val viaDriver = model.rotate(x)
      assert(viaCol.sameElements(viaDriver),
        "MatVecLit and Model.rotate must share arithmetic exactly")
    }
  }

  test("batch OPQ probe is bit-identical to single probes through the rotated index") {
    val e = Tables(spark, sf001, "embeddings")
    val store = graft.StoredArtifacts.dir(sf001, "ivfopq_index_v2")
    if (!graft.StoredArtifacts.ready(s"$store/codes"))
      Similarity.writeIvfOpqIndex(e, store, iters = 2, m = 8, kSub = 16, opqIters = 3)
    val qRows = e.where(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    import spark.implicits._
    val queries = qRows.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("q_id", "qvec")
    val batch = Similarity.probeIvfOpqBatch(spark, store, queries, nprobe = 6)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(r => r.getLong(1) -> r.getDouble(2)).toMap }
    for ((qid, qv) <- qRows) {
      val single = Similarity.probeIvfOpq(spark, store, qv, nprobe = 6)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(batch(qid).keySet == single.keySet,
        s"query $qid: batch candidates != single candidates")
      for ((id, sim) <- single)
        assert(batch(qid)(id) == sim,
          s"query $qid id $id: batch ${batch(qid)(id)} != single $sim")
    }
  }

  test("x111 registry entry is deterministic and its recall dominates raw PQ's") {
    val got = SparkEntry.queries("x111_ann_ivf_opq")(spark, sf001)
      .collect().map(_.getLong(0)).toSeq
    assert(got.length == 20)
    val again = SparkEntry.queries("x111_ann_ivf_opq")(spark, sf001)
      .collect().map(_.getLong(0)).toSeq
    assert(got == again, "OPQ serving must be deterministic across invocations")
    // the honest end-to-end claim at the byte-code budget (m=8, k=16 —
    // intentionally lossy; the 0.6 band belongs to the FLAT tier x62):
    // the learned rotation must not serve WORSE top-20 recall than the
    // un-rotated x68 index it refines. On the current fixture it is
    // strictly better (0.35 vs 0.25), matching the strict MSE win; >= is
    // asserted so a fixture regen that lands them equal is not a failure
    val exact = SparkEntry.queries("x06_cosine_topk")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    val rawPq = SparkEntry.queries("x68_ann_ivfpq")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    val opqRecall = (got.toSet & exact).size / 20.0
    val rawRecall = (rawPq & exact).size / 20.0
    assert(opqRecall >= rawRecall,
      s"x111 recall $opqRecall must dominate raw PQ's $rawRecall")
  }
}
