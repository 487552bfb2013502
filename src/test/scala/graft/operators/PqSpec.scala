package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for product quantization: the encoder picks nearest subspace
  * centroids, ADC scoring equals the exact cosine of the RECONSTRUCTED
  * vector (the decomposition is exact — quantization is the only
  * approximation), planted near-duplicate structure survives compression,
  * and corrupt vectors surface as null instead of plausible scores.
  */
class PqSpec extends SparkSpec {

  // 3 orthogonal meaning directions in 24 dims (m=4 subspaces x dsub=6):
  // per cluster 5 near-identical members; cluster c occupies dim 6c (so
  // each direction lives in its own subspace for c < 3, and subspace 3 is
  // shared noise)
  private lazy val planted = {
    import spark.implicits._
    val rows = for { c <- 0 until 3; j <- 0 until 5 } yield {
      val v = Array.fill(24)(0.0f)
      v(c * 6) = 1.0f
      v(18) = 0.01f * (j + 1) // per-member noise in the shared subspace
      ((c * 10 + j).toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("ADC score equals the exact cosine of the reconstructed vector") {
    val cb = ProductQuantizer.train(planted, m = 4, k = 4, iters = 2)
    val codes = ProductQuantizer.encode(planted, cb)
    val q = Array.tabulate(24)(i => if (i == 0) 1.0 else if (i == 18) 0.02 else 0.0)
    val got = codes
      .select(col("vec_id"), ProductQuantizer.adcScore(col("codes"), cb, q).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: reconstruct each vector from its codes on the driver and
    // take the true cosine — ADC must agree to fp-accumulation tolerance
    val codeRows = codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    for ((id, cs) <- codeRows) {
      val rec = cs.zipWithIndex.flatMap { case (c, sub) => cb.centroid(sub, c) }
      assert(math.abs(got(id) - cos(q, rec)) < 1e-9,
        s"vec $id: ADC ${got(id)} != cos(q, reconstruction) ${cos(q, rec)}")
    }
  }

  test("planted cluster structure survives compression: same-cluster codes collide, ranking recovers the cluster") {
    val cb = ProductQuantizer.train(planted, m = 4, k = 4, iters = 2)
    val codes = ProductQuantizer.encode(planted, cb)
    val byId = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    for (c <- 0 until 3) {
      val clusterCodes = (0 until 5).map(j => byId((c * 10 + j).toLong).take(3))
      assert(clusterCodes.distinct.size == 1,
        s"cluster $c members must share their direction subspace codes: $clusterCodes")
    }
    // a query on direction 0 ranks every cluster-0 member above all others
    val q = Array.tabulate(24)(i => if (i == 0) 1.0 else 0.0)
    val ranked = codes
      .select(col("vec_id"), ProductQuantizer.adcScore(col("codes"), cb, q).as("s"))
      .orderBy(col("s").desc, col("vec_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(ranked.take(5).toSet == (0 until 5).map(_.toLong).toSet,
      s"cluster 0 must fill the top-5, got ${ranked.take(5)}")
  }

  test("corrupt vectors and codes score null, never a plausible number") {
    import spark.implicits._
    val cb = ProductQuantizer.train(planted, m = 4, k = 4, iters = 1)
    // wrong dimensionality encodes to null
    val shortVec = Seq((99L, Array.fill(23)(1.0f))).toDF("vec_id", "embedding")
    val enc = ProductQuantizer.encode(shortVec, cb).head()
    assert(enc.isNullAt(1), "a 23-dim vector cannot encode against a 24-dim index")
    // out-of-range code scores null
    val q = Array.tabulate(24)(i => if (i == 0) 1.0 else 0.0)
    val badCodes = Seq((1L, Seq(0, 1, 2, 99))).toDF("vec_id", "codes")
    val s = badCodes.select(ProductQuantizer.adcScore(col("codes"), cb, q)).head()
    assert(s.isNullAt(0), "an out-of-range centroid index must score null")
  }

  test("IVF-PQ: pruned probe over cluster-partitioned codes recovers the planted cluster, floats never read") {
    import graft.queries.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft-ivfpq")
    val idx = base.resolve("ivfpq").toString
    try {
      val labeled = planted.withColumn("label",
        concat(lit("c"), (col("vec_id") / 10).cast("int")))
      Similarity.writeIvfPqIndex(labeled, idx, iters = 1, m = 4, kSub = 4)
      val q = Array.tabulate(24)(i => if (i == 0) 1.0 else 0.0)
      val probed = Similarity.probeIvfPq(spark, idx, q, nprobe = 1)
        .orderBy(col("sim_adc").desc, col("vec_id"))
      val got = probed.collect().map(_.getLong(0)).toSeq
      // nprobe=1 reads exactly the query direction's cell: all five
      // cluster-0 members, nothing else
      assert(got.toSet == (0 until 5).map(_.toLong).toSet,
        s"the probed cell must hold exactly the planted cluster: $got")

      // read-path pins: scans touch only the index; the codes scan is
      // partition-pruned on cluster and its schema holds codes, not a
      // float vector — no embedding exists anywhere on the read path
      val scans = graft.SparkSpec.allPlanNodes(probed.queryExecution.executedPlan)
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      assert(scans.nonEmpty)
      assert(scans.forall(_.metadata.get("Location").exists(_.contains("graft-ivfpq"))))
      val codeScan = scans
        .find(_.metadata.get("Location").exists(_.contains("codes")))
        .getOrElse(fail("no codes scan in the probe plan"))
      assert(codeScan.metadata.getOrElse("PartitionFilters", "").contains("cluster"),
        "the cell filter must prune partitions")
      assert(!codeScan.metadata.getOrElse("ReadSchema", "").contains("embedding"),
        s"the codes scan must not read vectors: ${codeScan.metadata.get("ReadSchema")}")
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  // coarse structure + within-cell detail in the SAME subspace: raw PQ's
  // k=4 codebook must spend centroids on the 3 distant coarse groups and
  // cannot also resolve the within-group spread; residual PQ only ever
  // sees the pooled within-cell spread
  private lazy val offsetCorpus = {
    import spark.implicits._
    val rows = for { c <- 0 until 3; j <- 0 until 5 } yield {
      val v = Array.fill(24)(0.0f)
      v(0) = 10f * (c + 1) + 0.1f * j
      v(6) = 1.0f
      ((c * 10 + j).toLong, v, s"c$c")
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("residual ADC equals the exact cosine of c_cell + residual reconstruction") {
    import graft.queries.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft-pqr")
    val idx = base.resolve("pqr").toString
    try {
      Similarity.writeIvfPqResidualIndex(offsetCorpus, idx, iters = 2, m = 4, kSub = 4)
      val q = Array.tabulate(24)(i =>
        if (i == 0) 20.2 else if (i == 6) 1.0 else 0.0)
      val got = Similarity.probeIvfPqResidual(spark, idx, q, nprobe = 3)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.size == 15, "nprobe=3 covers every cell")
      val cb = ProductQuantizer.readCodebooks(spark, idx)
      val coarse = Similarity.readIvfCentroids(spark, idx)
      // codes are stored byte-packed (binary): read back as unsigned ints
      val codeRows = spark.read.parquet(s"$idx/codes").collect()
        .map(r => (r.getLong(r.fieldIndex("vec_id")),
          r.getAs[Array[Byte]](r.fieldIndex("codes")).map(_ & 0xff),
          r.getInt(r.fieldIndex("cluster"))))
      for ((id, codes, cell) <- codeRows) {
        val rec = coarse(cell).clone()
        for (sub <- 0 until cb.m; d <- 0 until cb.dsub)
          rec(sub * cb.dsub + d) += cb.centroid(sub, codes(sub))(d)
        assert(math.abs(got(id) - cos(q, rec)) < 1e-9,
          s"vec $id: residual ADC ${got(id)} != cos(q, c + r̂) ${cos(q, rec)}")
      }
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("residual quantization reconstructs strictly better than raw PQ at the same code budget") {
    import graft.queries.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft-pqr2")
    val idx = base.resolve("pqr").toString
    try {
      Similarity.writeIvfPqResidualIndex(offsetCorpus, idx, iters = 2, m = 4, kSub = 4)
      val cb = ProductQuantizer.readCodebooks(spark, idx)
      val coarse = Similarity.readIvfCentroids(spark, idx)
      val vecs = offsetCorpus.collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
      val residErr = spark.read.parquet(s"$idx/codes").collect().map { r =>
        val (id, codes, cell) = (r.getLong(r.fieldIndex("vec_id")),
          r.getAs[Array[Byte]](r.fieldIndex("codes")).map(_ & 0xff),
          r.getInt(r.fieldIndex("cluster")))
        val rec = coarse(cell).clone()
        for (sub <- 0 until cb.m; d <- 0 until cb.dsub)
          rec(sub * cb.dsub + d) += cb.centroid(sub, codes(sub))(d)
        math.sqrt(vecs(id).zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sum / 15.0
      val cbRaw = ProductQuantizer.train(
        offsetCorpus.select(col("vec_id"), col("embedding")), m = 4, k = 4, iters = 2)
      val rawErr = ProductQuantizer.encode(
          offsetCorpus.select(col("vec_id"), col("embedding")), cbRaw)
        .collect().map { r =>
          val (id, codes) = (r.getLong(0), r.getSeq[Int](1).toArray)
          val rec = codes.zipWithIndex.flatMap { case (c, sub) => cbRaw.centroid(sub, c) }
          math.sqrt(vecs(id).zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum)
        }.sum / 15.0
      assert(residErr < rawErr,
        s"residual recon error $residErr must beat raw PQ $rawErr on coarse+detail structure")
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("byte-packed codes are m bytes and score bit-identically to array<int> codes") {
    val cb = ProductQuantizer.train(planted, m = 4, k = 4, iters = 2)
    val ints = ProductQuantizer.encode(planted, cb)
      .withColumnRenamed("codes", "codes_int")
    val packed = ProductQuantizer.encode(planted, cb, packed = true)
      .withColumnRenamed("codes", "codes_bin")
    val q = Array.tabulate(24)(i => if (i == 0) 1.0 else if (i == 18) 0.02 else 0.0)
    val both = ints.join(packed, "vec_id")
      .select(col("vec_id"),
        col("codes_int"), col("codes_bin"),
        ProductQuantizer.adcScore(col("codes_int"), cb, q).as("s_int"),
        ProductQuantizer.adcScore(col("codes_bin"), cb, q).as("s_bin"))
      .collect()
    assert(both.length == 15)
    for (r <- both) {
      val bin = r.getAs[Array[Byte]]("codes_bin")
      assert(bin.length == 4, s"packed codes must be exactly m bytes, got ${bin.length}")
      assert(bin.map(_ & 0xff).toSeq == r.getSeq[Int](1).toSeq,
        s"vec ${r.getLong(0)}: packed bytes must hold the same code values")
      // same LUT arithmetic on both input forms — bit-identical, not close
      assert(r.getDouble(3) == r.getDouble(4),
        s"vec ${r.getLong(0)}: packed ADC ${r.getDouble(4)} != unpacked ${r.getDouble(3)}")
    }
  }

  test("packed codes file costs bytes-per-row near m, the honest 32x storage claim") {
    val base = java.nio.file.Files.createTempDirectory("graft-pqsize")
    val dir = base.resolve("codes").toString
    try {
      val e = graft.Tables(spark, sf001, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val cb = ProductQuantizer.train(e, m = 8, k = 16, iters = 1)
      ProductQuantizer.encode(e, cb, packed = true)
        .write.mode("overwrite").parquet(dir)
      val rows = spark.read.parquet(dir).count()
      val bytes = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .mapToLong(java.nio.file.Files.size).sum()
      // m code bytes + 8-byte id per row, plus bounded parquet framing:
      // the bound fails if codes regress to the 4-bytes-per-code int form
      val budget = rows * (cb.m + 8 + 16) + 4096
      assert(bytes <= budget,
        s"packed codes cost $bytes bytes for $rows rows — exceeds $budget; " +
          "did the codes column regress to array<int>?")
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("exact re-rank strictly beats raw ADC recall on detail quantization erased, fetching exactly C vectors") {
    import graft.queries.Similarity
    import spark.implicits._
    // 30 vectors sharing one direction, with a detail component 0.01·(j+1)
    // on dim 2 that grows with id; the query carries 0.3 on that dim, so
    // the EXACT cosine is strictly increasing in j (detail approaches the
    // query's ratio from below): true top-10 = ids 20..29. Under m=4, k=2
    // quantization the detail subspace collapses to two centroids — every
    // vector in the query-side cell shares one code, ADC ties, and the
    // deterministic id tie-break ranks LOW ids first: raw ADC misses most
    // of the true top-10. Re-ranking the ADC top-C by exact cosine over
    // the fetched true vectors recovers it completely.
    val corpus = (0 until 30).map { j =>
      val v = Array.fill(8)(0.0f)
      v(0) = 1.0f
      v(2) = 0.01f * (j + 1)
      (j.toLong, v)
    }.toDF("vec_id", "embedding")
    val q = Array.tabulate(8)(i => if (i == 0) 1.0 else if (i == 2) 0.3 else 0.0)
    val trueTop10 = (20L until 30L).toSet

    val cb = ProductQuantizer.train(corpus, m = 4, k = 2, iters = 2)
    val scored = ProductQuantizer.encode(corpus, cb, packed = true)
      .select(col("vec_id"), ProductQuantizer.adcScore(col("codes"), cb, q).as("s"))
    val adcTop10 = scored.orderBy(col("s").desc, col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    val recallAdc = (adcTop10 & trueTop10).size / 10.0
    assert(recallAdc < 1.0,
      s"the construction must make raw ADC lossy, got recall $recallAdc")

    val reranked = Similarity.rerankExact(corpus, scored, q, topC = 20)
    // fetch discipline: exactly C candidate vectors are scored — the
    // whole point of the two-stage shape (C exact cosines, not |corpus|)
    assert(reranked.count() == 20, "re-rank must score exactly topC fetched vectors")
    val rerTop10 = reranked.orderBy(col("sim").desc, col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    val recallRer = (rerTop10 & trueTop10).size / 10.0
    assert(recallRer > recallAdc,
      s"re-rank recall $recallRer must strictly beat raw ADC $recallAdc")
    assert(recallRer == 1.0,
      s"C=20 covers the true top-10, so exact re-rank must recover it: $rerTop10")
  }

  test("x72 registry entry: two-stage serving returns exact-cosine scores for its top-20") {
    val got = graft.SparkEntry.queries("x72_ann_pq_rerank")(spark, sf001).collect()
    assert(got.length == 20)
    // stage-2 scores are TRUE cosines: they must agree with the exact
    // brute-force query (x06) on every id the two top-20s share
    val exact = graft.SparkEntry.queries("x06_cosine_topk")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val shared = got.filter(r => exact.contains(r.getLong(0)))
    assert(shared.nonEmpty, "two-stage top-20 must overlap the exact top-20")
    for (r <- shared)
      assert(math.abs(r.getDouble(1) - exact(r.getLong(0))) < 1e-12,
        s"id ${r.getLong(0)}: re-rank sim ${r.getDouble(1)} != exact ${exact(r.getLong(0))}")
    val again = graft.SparkEntry.queries("x72_ann_pq_rerank")(spark, sf001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "two-stage serving must be deterministic across invocations")
  }

  test("batch IVF-PQ probe equals B single probes through one scan of the unioned code cells") {
    import graft.queries.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft-ivfpqb")
    val idx = base.resolve("ivfpq").toString
    try {
      val labeled = planted.withColumn("label",
        concat(lit("c"), (col("vec_id") / 10).cast("int")))
      Similarity.writeIvfPqIndex(labeled, idx, iters = 1, m = 4, kSub = 4)
      import spark.implicits._
      val qVecs = Seq(
        0L -> Array.tabulate(24)(i => if (i == 0) 1.0 else 0.0),
        1L -> Array.tabulate(24)(i => if (i == 6) 1.0 else 0.0),
        2L -> Array.tabulate(24)(i => if (i == 12) 1.0 else if (i == 18) 0.05 else 0.0))
      val queries = qVecs.map { case (id, v) => (id, v.toSeq) }.toDF("q_id", "qvec")

      val batch = Similarity.probeIvfPqBatch(spark, idx, queries, nprobe = 2)
      val got = batch.collect()
        .groupBy(_.getLong(0))
        .map { case (q, rows) =>
          q -> rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
        }
      assert(got.keySet == qVecs.map(_._1).toSet)
      // per-query candidates AND scores bit-identical to the single probe
      for ((qid, q) <- qVecs) {
        val single = Similarity.probeIvfPq(spark, idx, q, nprobe = 2)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got(qid).keySet == single.keySet,
          s"query $qid: batch candidates != single-probe candidates")
        for ((id, sim) <- single)
          assert(got(qid)(id) == sim,
            s"query $qid id $id: batch ADC ${got(qid)(id)} != single $sim")
      }
      // one scan of the codes table for the whole batch, pruned, no floats
      val scans = graft.SparkSpec.allPlanNodes(batch.queryExecution.executedPlan)
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      val codeScans = scans.filter(_.metadata.get("Location").exists(_.contains("codes")))
      assert(codeScans.length == 1,
        s"codes must be scanned once for the whole batch, got ${codeScans.length}")
      assert(codeScans.head.metadata.getOrElse("PartitionFilters", "").contains("cluster"))
      assert(!codeScans.head.metadata.getOrElse("ReadSchema", "").contains("embedding"))
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("x75 registry entry serves per-query ADC top-10 for the whole batch deterministically") {
    val got = graft.SparkEntry.queries("x75_ann_ivfpq_batch")(spark, sf001).collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet, s"one group per batch query: ${byQ.keySet}")
    for ((q, rows) <- byQ) {
      assert(rows.length == 10, s"query $q: expected top-10, got ${rows.length}")
      assert(!rows.map(_.getLong(1)).contains(q), s"query $q must exclude itself")
    }
    val again = graft.SparkEntry.queries("x75_ann_ivfpq_batch")(spark, sf001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "batch ADC serving must be deterministic across invocations")
  }

  test("batch two-stage re-rank equals B single-query two-stage paths") {
    import graft.queries.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft-rerankb")
    val idx = base.resolve("ivfpq").toString
    try {
      val labeled = planted.withColumn("label",
        concat(lit("c"), (col("vec_id") / 10).cast("int")))
      Similarity.writeIvfPqIndex(labeled, idx, iters = 1, m = 4, kSub = 4)
      import spark.implicits._
      val qVecs = Seq(
        0L -> Array.tabulate(24)(i => if (i == 0) 1.0 else if (i == 18) 0.03 else 0.0),
        1L -> Array.tabulate(24)(i => if (i == 6) 1.0 else 0.0))
      val queries = qVecs.map { case (id, v) => (id, v.toSeq) }.toDF("q_id", "qvec")
      val corpus = planted

      val cands = Similarity.probeIvfPqBatch(spark, idx, queries, nprobe = 3)
      val batch = Similarity.rerankExactBatch(corpus, cands, queries, topC = 6)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (q, rows) =>
          q -> rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
        }
      for ((qid, q) <- qVecs) {
        val single = Similarity.rerankExact(corpus,
            Similarity.probeIvfPq(spark, idx, q, nprobe = 3), q, topC = 6)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(batch(qid).keySet == single.keySet,
          s"query $qid: batch re-rank candidates != single path")
        for ((id, sim) <- single)
          assert(batch(qid)(id) == sim,
            s"query $qid id $id: batch exact sim ${batch(qid)(id)} != single $sim")
      }
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("x76 registry entry: full batch two-stage serving, exact scores, deterministic") {
    val got = graft.SparkEntry.queries("x76_ann_batch_rerank")(spark, sf001).collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet)
    for ((q, rows) <- byQ) {
      assert(rows.length == 10, s"query $q: expected top-10, got ${rows.length}")
      assert(!rows.map(_.getLong(1)).contains(q), s"query $q must exclude itself")
    }
    // stage-2 scores are true cosines: query 0's shared ids must agree
    // with the exact brute-force top-20
    val exact = graft.SparkEntry.queries("x06_cosine_topk")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q0shared = byQ(0L).filter(r => exact.contains(r.getLong(1)))
    assert(q0shared.nonEmpty)
    for (r <- q0shared)
      assert(math.abs(r.getDouble(2) - exact(r.getLong(1))) < 1e-12)
    val again = graft.SparkEntry.queries("x76_ann_batch_rerank")(spark, sf001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("batch residual probe equals B single residual probes; cross-term LUTs amortize over the batch") {
    import graft.queries.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft-pqrb")
    val idx = base.resolve("pqr").toString
    try {
      Similarity.writeIvfPqResidualIndex(offsetCorpus, idx, iters = 2, m = 4, kSub = 4)
      import spark.implicits._
      val qVecs = Seq(
        0L -> Array.tabulate(24)(i =>
          if (i == 0) 20.2 else if (i == 6) 1.0 else 0.0),
        1L -> Array.tabulate(24)(i =>
          if (i == 0) 10.1 else if (i == 6) 1.0 else 0.0))
      val queries = qVecs.map { case (id, v) => (id, v.toSeq) }.toDF("q_id", "qvec")

      val batch = Similarity.probeIvfPqResidualBatch(spark, idx, queries, nprobe = 2)
      val got = batch.collect()
        .groupBy(_.getLong(0))
        .map { case (q, rows) =>
          q -> rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
        }
      assert(got.keySet == qVecs.map(_._1).toSet)
      for ((qid, q) <- qVecs) {
        val single = Similarity.probeIvfPqResidual(spark, idx, q, nprobe = 2)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got(qid).keySet == single.keySet,
          s"query $qid: batch residual candidates != single probe")
        for ((id, sim) <- single)
          assert(got(qid)(id) == sim,
            s"query $qid id $id: batch residual ADC ${got(qid)(id)} != single $sim")
      }
      // one pruned, float-free scan for the whole batch
      val scans = graft.SparkSpec.allPlanNodes(batch.queryExecution.executedPlan)
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      val codeScans = scans.filter(_.metadata.get("Location").exists(_.contains("codes")))
      assert(codeScans.length == 1)
      assert(codeScans.head.metadata.getOrElse("PartitionFilters", "").contains("cluster"))
      assert(!codeScans.head.metadata.getOrElse("ReadSchema", "").contains("embedding"))
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("x77 registry entry serves per-query residual ADC top-10 deterministically") {
    val got = graft.SparkEntry.queries("x77_ann_ivfpqr_batch")(spark, sf001).collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet)
    for ((q, rows) <- byQ) {
      assert(rows.length == 10, s"query $q: expected top-10, got ${rows.length}")
      assert(!rows.map(_.getLong(1)).contains(q))
    }
    val again = graft.SparkEntry.queries("x77_ann_ivfpqr_batch")(spark, sf001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("x70 registry entry serves from the stored residual index, deterministically") {
    val got = graft.SparkEntry.queries("x70_ann_ivfpq_residual")(spark, sf001).collect()
    assert(got.length == 20)
    val again = graft.SparkEntry.queries("x70_ann_ivfpq_residual")(spark, sf001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("x67 registry entry serves top-20 from the stored PQ index, deterministically") {
    val got = graft.SparkEntry.queries("x67_ann_pq_adc")(spark, sf001).collect()
    assert(got.length == 20)
    val again = graft.SparkEntry.queries("x67_ann_pq_adc")(spark, sf001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "stored-index ADC scan must be deterministic across invocations")
  }
}
