package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization gates: the per-dim error bound the format
  * promises, kernel-vs-driver score identity, storage width, and recall
  * against the exact scan on a planted corpus.
  */
class Sq8Spec extends SparkSpec {

  // 60 vectors in 8 dims: three orthogonal-ish groups plus per-vector
  // jitter, deterministic from the id
  private def corpus = {
    import spark.implicits._
    (0 until 60).map { i =>
      val v = Array.tabulate(8) { d =>
        val base = if (d == i % 3) 1.0f else 0.1f
        base + 0.01f * ((i * 7 + d * 3) % 13)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def exactTop(k: Int, q: Array[Double]): Seq[Long] = {
    import spark.implicits._
    val qlit = typedLit(q)
    corpus
      .select(col("vec_id"),
        graft.functions.VectorOps.cosine(col("embedding"), qlit).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k).collect().map(_.getLong(0)).toSeq
  }

  test("reconstruction error is bounded by delta/510 per dimension") {
    val model = ScalarQuantizer.train(corpus)
    val rows = ScalarQuantizer.encode(corpus, model)
      .join(corpus, "vec_id")
      .select(col("codes"), col("embedding").cast("array<double>"))
      .collect()
    rows.foreach { r =>
      val rec = model.reconstruct(r.getAs[Array[Byte]](0))
      val orig = r.getSeq[Double](1)
      (0 until model.dim).foreach { d =>
        // half a quantization step, plus float32->double read noise
        val bound = model.deltas(d) / 510.0 + 1e-6
        assert(math.abs(rec(d) - orig(d)) <= bound,
          s"dim $d: |${rec(d)} - ${orig(d)}| > $bound")
      }
    }
  }

  test("codes are exactly dim bytes — 4x under float32") {
    val model = ScalarQuantizer.train(corpus)
    val lens = ScalarQuantizer.encode(corpus, model)
      .select(length(col("codes"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(lens == Seq(8), s"every code row must be dim=8 bytes, got $lens")
  }

  test("kernel score equals driver-side cosine of the reconstruction at 1e-12") {
    val model = ScalarQuantizer.train(corpus)
    val q = Array.tabulate(8)(d => 0.3 + 0.1 * d)
    val qn = math.sqrt(q.map(x => x * x).sum)
    val scored = ScalarQuantizer.encode(corpus, model)
      .select(col("vec_id"), col("codes"),
        ScalarQuantizer.adcScore(col("codes"), model, q).as("sim"))
      .collect()
    scored.foreach { r =>
      val rec = model.reconstruct(r.getAs[Array[Byte]](1))
      val dot = rec.zip(q).map { case (a, b) => a * b }.sum
      val rn = math.sqrt(rec.map(x => x * x).sum)
      val expected = dot / (qn * rn)
      assert(math.abs(r.getDouble(2) - expected) < 1e-12,
        s"vec ${r.getLong(0)}: kernel ${r.getDouble(2)} vs driver $expected")
    }
  }

  test("SQ8 top-10 recall against the exact scan is >= 0.9 on the planted corpus") {
    val model = ScalarQuantizer.train(corpus)
    val q = Array(1.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1)
    val exact = exactTop(10, q).toSet
    val sq8 = ScalarQuantizer.encode(corpus, model)
      .select(col("vec_id"), ScalarQuantizer.adcScore(col("codes"), model, q).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    val recall = (exact intersect sq8).size / 10.0
    assert(recall >= 0.9, s"recall@10 = $recall")
  }

  test("IVF-SQ8: pruned byte-code probe agrees with the flat IVF probe and never reads a float") {
    import graft.queries.Similarity
    import graft.Tables
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = java.nio.file.Files.createTempDirectory("graft-ivfsq8")
    val flatIdx = base.resolve("flat").toString
    val sq8Idx = base.resolve("sq8").toString
    try {
      val e = Tables(spark, sf001, "embeddings")
      Similarity.writeIvfIndex(e, flatIdx, iters = 2)
      Similarity.writeIvfSq8Index(e, sq8Idx, iters = 2)
      val qvec = e.where(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toArray

      def top20(df: org.apache.spark.sql.DataFrame, sim: String): Seq[Long] =
        df.where(col("vec_id") =!= 0)
          .orderBy(col(sim).desc, col("vec_id")).limit(20)
          .collect().map(_.getLong(0)).toSeq

      val flat = top20(Similarity.probeStoredIvf(spark, flatIdx, qvec, 6), "sim")
      val probed = Similarity.probeIvfSq8(spark, sq8Idx, qvec, 6)
        .where(col("vec_id") =!= 0)
        .orderBy(col("sim_sq8").desc, col("vec_id")).limit(20)
      val sq8 = probed.collect().map(_.getLong(0)).toSeq

      // identical coarse quantizer (same deterministic seed + iters), so
      // the candidate cells match; SQ8's near-lossless scores may swap
      // only boundary-close neighbors
      assert((flat.toSet intersect sq8.toSet).size >= 18,
        s"IVF-SQ8 must track the flat probe: flat=$flat sq8=$sq8")

      val scans = graft.SparkSpec.allPlanNodes(probed.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty && scans.forall(
          _.metadata.getOrElse("Location", "").contains("sq8")),
        "probe must scan only the stored index")
      val cellScan = scans.find(_.metadata.getOrElse("Location", "").contains("codes")).get
      assert(cellScan.metadata.getOrElse("PartitionFilters", "").contains("cluster"),
        "cluster IN (...) must prune partitions")
      assert(!cellScan.schema.catalogString.contains("array<float>"),
        s"the code scan must read bytes, not vectors: ${cellScan.schema.catalogString}")
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("batch IVF-SQ8 probe equals B single probes through one scan of the unioned code cells") {
    import graft.queries.Similarity
    import graft.Tables
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = java.nio.file.Files.createTempDirectory("graft-ivfsq8b")
    val idx = base.resolve("sq8").toString
    try {
      val e = Tables(spark, sf001, "embeddings")
      Similarity.writeIvfSq8Index(e, idx, iters = 2)
      val queries = e.where(col("vec_id") < 6)
        .select(col("vec_id"), col("embedding"))
      val qVecs = queries.select(col("vec_id"),
          col("embedding").cast("array<double>"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)

      val batch = Similarity.probeIvfSq8Batch(spark, idx, queries, nprobe = 3)
      val got = batch.collect()
        .groupBy(_.getLong(0))
        .map { case (q, rows) =>
          q -> rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
        }
      assert(got.keySet == qVecs.map(_._1).toSet)
      // per-query candidates AND scores bit-identical to the single probe
      for ((qid, q) <- qVecs) {
        val single = Similarity.probeIvfSq8(spark, idx, q, nprobe = 3)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got(qid).keySet == single.keySet,
          s"query $qid: batch candidates != single-probe candidates")
        for ((id, sim) <- single)
          assert(got(qid)(id) == sim,
            s"query $qid id $id: batch SQ8 ${got(qid)(id)} != single $sim")
      }
      // one scan of the codes table for the whole batch, pruned, no floats
      val scans = graft.SparkSpec.allPlanNodes(batch.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec => f }
      val codeScans = scans.filter(_.metadata.get("Location").exists(_.contains("codes")))
      assert(codeScans.length == 1,
        s"codes must be scanned once for the whole batch, got ${codeScans.length}")
      assert(codeScans.head.metadata.getOrElse("PartitionFilters", "").contains("cluster"))
      assert(!codeScans.head.metadata.getOrElse("ReadSchema", "").contains("embedding"))
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("x400 code occupancy: bands partition every code and replay from a driver-side quantize") {
    val rows = graft.SparkEntry.queries("x400_sq8_code_occupancy")(spark, sf001)
      .collect()
    assert(rows.map(_.getAs[Long]("band")).toSeq == (0L to 6L),
      "all 7 bands present in order")
    val total = rows.head.getAs[Long]("n_codes") +
      rows.tail.map(_.getAs[Long]("n_codes")).sum
    // driver-side replay of the shared normalize-quantize map
    val e = graft.Tables(spark, sf001, "embeddings")
      .selectExpr("cast(embedding as array<double>) as emb")
      .collect().map(_.getSeq[Double](0).toArray)
    val codes = e.flatMap { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => math.abs(math.floor(127.0 * x / n + 0.5).toLong))
    }
    assert(total == codes.length.toLong, "bands must partition every code")
    val bounds = Seq((0L, 0L), (1L, 7L), (8L, 15L), (16L, 31L), (32L, 63L),
      (64L, 126L), (127L, 127L))
    for ((r, (lo, hi)) <- rows.zip(bounds)) {
      val expect = codes.count(c => c >= lo && c <= hi).toLong
      assert(r.getAs[Long]("n_codes") == expect,
        s"band [$lo,$hi]: ${r.getAs[Long]("n_codes")} != $expect")
      assert(r.getAs[Long]("codes_ppm") ==
        1000000L * expect / codes.length)
      assert(r.getAs[Long]("max_abs_code") == codes.max)
      assert(r.getAs[Long]("util_milli") == 1000L * codes.max / 127L)
    }
  }

  test("x401 dim bias: per-dimension sums replay from a driver-side quantize") {
    val rows = graft.SparkEntry.queries("x401_sq8_dim_bias")(spark, sf001)
      .collect()
    val vecs = graft.Tables(spark, sf001, "embeddings")
      .selectExpr("cast(embedding as array<double>) as emb")
      .collect().map(_.getSeq[Double](0).toArray)
    val dims = vecs.head.length
    assert(rows.map(_.getAs[Long]("dim")).toSeq == (0L until dims.toLong))
    val codes = vecs.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => math.floor(127.0 * x / n + 0.5).toLong)
    }
    for (r <- rows) {
      val d = r.getAs[Long]("dim").toInt
      val col = codes.map(_(d))
      assert(r.getAs[Long]("n_vecs") == vecs.length.toLong)
      assert(r.getAs[Long]("sum_code") == col.sum, s"dim $d sum")
      val sc = col.sum
      val expMean = if (sc >= 0) 1000L * sc / vecs.length
        else -(1000L * -sc / vecs.length)
      assert(r.getAs[Long]("mean_code_milli") == expMean, s"dim $d mean")
      assert(r.getAs[Long]("mean_abs_milli") ==
        1000L * col.map(math.abs).sum / vecs.length, s"dim $d mean_abs")
      assert(r.getAs[Long]("max_abs") == col.map(math.abs).max, s"dim $d max")
    }
  }

  test("x88 registry entry serves per-query SQ8 top-10 for the whole batch deterministically") {
    val got = graft.SparkEntry.queries("x88_ann_ivf_sq8_batch")(spark, sf001).collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet, s"one group per batch query: ${byQ.keySet}")
    for ((q, rows) <- byQ) {
      assert(rows.length == 10, s"query $q: expected top-10, got ${rows.length}")
      assert(!rows.map(_.getLong(1)).contains(q), s"query $q must exclude itself")
    }
    val again = graft.SparkEntry.queries("x88_ann_ivf_sq8_batch")(spark, sf001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "batch SQ8 serving must be deterministic across invocations")
  }

  test("out-of-range vectors clamp instead of wrapping") {
    import spark.implicits._
    val model = ScalarQuantizer.train(corpus)
    val wild = Seq((999L, Array.fill(8)(100.0f)), (998L, Array.fill(8)(-100.0f)))
      .toDF("vec_id", "embedding")
    val codes = ScalarQuantizer.encode(wild, model).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(codes(999L).forall(b => (b & 0xff) == 255), "above-range saturates high")
    assert(codes(998L).forall(b => (b & 0xff) == 0), "below-range saturates low")
  }
}
