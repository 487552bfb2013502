package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `spark.sql` entry point over the same tables: a user of the engine can
  * run the §2.B queries as ANSI SQL against temp views and get row-identical
  * results to the DataFrame API forms — the two front-ends share Catalyst, so
  * this pins that the registry's DataFrame plans ARE the SQL semantics.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def register(): Unit =
    for (t <- Seq("orders", "lineitem", "customer", "events"))
      Tables(spark, sf001, t).createOrReplaceTempView(t)

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("SQL and DataFrame forms of the q18 group-having-join agree") {
    register()
    val sql = spark.sql(
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, big.total_qty
        |FROM orders o JOIN (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150.0) big
        |ON o.o_orderkey = big.l_orderkey
        |ORDER BY o.o_orderkey""".stripMargin)
    val df = SparkEntry.queries("q18_large_orders")(spark, sf001)
    assert(rows(sql) == rows(df))
  }

  test("SQL windowed ranking agrees with the DataFrame c03 form") {
    register()
    val sql = spark.sql(
      """SELECT o_custkey, o_orderkey,
        |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin)
    val df = SparkEntry.queries("c03_window_latest_per_key")(spark, sf001)
    assert(rows(sql) == rows(df))
  }

  test("native kernels are callable from SQL and bit-match the Column API") {
    graft.functions.SqlFunctions.register(spark)
    Tables(spark, sf001, "embeddings").createOrReplaceTempView("embeddings")
    Tables(spark, sf001, "documents").createOrReplaceTempView("documents")

    // vector kernel: SQL l2_norm resolves to the SAME Catalyst expression
    val viaSql = spark.sql(
      "SELECT vec_id, l2_norm(embedding) AS n FROM embeddings ORDER BY vec_id LIMIT 5")
      .collect().map(_.getDouble(1)).toSeq
    val viaCol = Tables(spark, sf001, "embeddings")
      .select(col("vec_id"), graft.functions.VectorOps.l2norm(col("embedding")).as("n"))
      .orderBy("vec_id").limit(5)
      .collect().map(_.getDouble(1)).toSeq
    assert(viaSql == viaCol, "same expression => bitwise-identical results")

    // full SQL-side similarity: cosine between doc 0's embedding and the rest
    val top = spark.sql(
      """SELECT e.vec_id,
        |  cosine_sim(e.embedding, q.embedding) AS sim
        |FROM embeddings e JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0 ORDER BY sim DESC, e.vec_id LIMIT 5""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    val expected = SparkEntry.queries("x06_cosine_topk")(spark, sf001)
      .limit(5).collect().map(_.getLong(0)).toSeq
    assert(top == expected, s"SQL cosine top-5 $top vs Column API $expected")

    // text kernels with literal args: minhash_sig + sig_agreement end to end
    val agree = spark.sql(
      """SELECT sig_agreement(
        |  minhash_sig(split(text, ' '), 32, 3),
        |  minhash_sig(split(text, ' '), 32, 3)) AS a
        |FROM documents LIMIT 1""".stripMargin).head().getLong(0)
    assert(agree == 32L, "identical docs agree on every slot")
  }

  test("SQL misuse of a native kernel fails at ANALYSIS, not on an executor") {
    graft.functions.SqlFunctions.register(spark)
    Tables(spark, sf001, "documents").createOrReplaceTempView("documents")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(text, text) FROM documents").collect()
    }
    assert(ex.getMessage.contains("cosine_sim"),
      s"error must name the kernel and argument: ${ex.getMessage}")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT jaccard_longs(split(text, ' '), split(text, ' ')) FROM documents")
        .collect() // array<string>, not array<long> — must fail during analysis
    }
  }

  test("EVERY registered kernel rejects a wrong-typed call at analysis time") {
    graft.functions.SqlFunctions.register(spark)
    Tables(spark, sf001, "documents").createOrReplaceTempView("documents")
    // one deliberately ill-typed invocation per registered function; each
    // must fail during analysis (AnalysisException), never on an executor
    val bad = Seq(
      "cosine_sim" -> "cosine_sim(text, text)",
      "cosine_sim_prenorm" -> "cosine_sim_prenorm(text, text, 1.0)",
      "l2_norm" -> "l2_norm(text)",
      "sq_dist" -> "sq_dist(doc_id, doc_id)",
      "simhash64" -> "simhash64(doc_id)",
      "token_rolling_hash" -> "token_rolling_hash(n_chars)",
      "token_hash_set" -> "token_hash_set(doc_id)",
      "jaccard_longs" -> "jaccard_longs(split(text, ' '), split(text, ' '))",
      "sig_agreement" -> "sig_agreement(text, text)",
      "minhash_sig" -> "minhash_sig(text, 8)",
      "shingle_hashes" -> "shingle_hashes(doc_id, 3)",
      "top_token_count" -> "top_token_count(n_chars)",
      "bpe_merge_step" -> "bpe_merge_step(doc_id, 'a', 'b')",
      "bpe_apply_all" -> "bpe_apply_all(doc_id, array('a'), array('b'))",
      "hyperplane_buckets" -> "hyperplane_buckets(text, 4, 2)",
      "nfc_normalize" -> "nfc_normalize(doc_id)",
      // hll_distinct casts ANY scalar to string by design (the canonical
      // md5(CAST(x AS STRING)) input), so its misuse row is an arity
      // violation — same analysis-time failure contract via arity()
      "hll_distinct" -> "hll_distinct(text, text)",
      "jaro_winkler" -> "jaro_winkler(doc_id, text)")
    // self-enforcing completeness: registering a new kernel without adding
    // a bad-call row here must fail this gate, not silently escape it
    val registered = graft.functions.SqlFunctions.names.toSet
    val covered = bad.map(_._1).toSet
    assert(covered == registered,
      s"misuse gate out of sync with SqlFunctions.names: " +
        s"uncovered=${registered -- covered} stale=${covered -- registered}")
    for ((name, call) <- bad) {
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $call FROM documents").collect()
      }
      assert(ex.getMessage.contains(name),
        s"$name: analysis error must name the kernel: ${ex.getMessage}")
    }
  }

  test("out-of-range scalar literals fail at ANALYSIS too, naming the argument") {
    // a well-typed call with a bad parameter VALUE (shingle_hashes(arr, 0))
    // must fail exactly like a wrong-typed one: AnalysisException during
    // analysis, never IllegalArgumentException from a constructor require()
    // at expression-build time (ADVICE r3) — range checks live in
    // checkInputDataTypes
    graft.functions.SqlFunctions.register(spark)
    Tables(spark, sf001, "documents").createOrReplaceTempView("documents")
    Tables(spark, sf001, "embeddings").createOrReplaceTempView("embeddings")
    val badLiteral = Seq(
      ("shingle_hashes", "ngram", "shingle_hashes(split(text, ' '), 0) FROM documents"),
      ("shingle_hashes", "ngram", "shingle_hashes(split(text, ' '), 17) FROM documents"),
      ("simhash64", "ngram", "simhash64(split(text, ' '), -1) FROM documents"),
      ("minhash_sig", "k", "minhash_sig(split(text, ' '), 0) FROM documents"),
      ("minhash_sig", "k", "minhash_sig(split(text, ' '), 1025) FROM documents"),
      ("minhash_sig", "ngram", "minhash_sig(split(text, ' '), 8, 99) FROM documents"),
      ("hyperplane_buckets", "nPlanes", "hyperplane_buckets(embedding, 0, 4) FROM embeddings"),
      ("hyperplane_buckets", "nTables", "hyperplane_buckets(embedding, 4, 65) FROM embeddings"))
    for ((name, arg, call) <- badLiteral) {
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $call").collect()
      }
      assert(ex.getMessage.contains(name) && ex.getMessage.contains(arg),
        s"$name: range error must name kernel and argument: ${ex.getMessage}")
    }
  }

  test("non-literal scalar parameters and wrong arity fail at ANALYSIS too") {
    // builders run at function-resolution time; a failed parameter
    // extraction must surface as AnalysisException (via the deferred
    // InvalidKernelCall placeholder), never as a raw
    // IllegalArgumentException at expression-build time (ADVICE r4)
    graft.functions.SqlFunctions.register(spark)
    Tables(spark, sf001, "documents").createOrReplaceTempView("documents")
    val badParam = Seq(
      ("minhash_sig", "k", "minhash_sig(split(text, ' '), n_chars) FROM documents"),
      ("shingle_hashes", "ngram", "shingle_hashes(split(text, ' '), 1 + 1) FROM documents"),
      ("bpe_merge_step", "left", "bpe_merge_step(split(text, ' '), text, 'b') FROM documents"),
      ("bpe_apply_all", "lefts", "bpe_apply_all(split(text, ' '), split(text, ' '), array('b')) FROM documents"))
    for ((name, arg, call) <- badParam) {
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $call").collect()
      }
      assert(ex.getMessage.contains(name) && ex.getMessage.contains(arg),
        s"$name: non-literal param must name kernel and argument: ${ex.getMessage}")
    }
    val arity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT l2_norm() FROM documents").collect()
    }
    assert(arity.getMessage.contains("l2_norm"),
      s"wrong arity must fail analysis naming the kernel: ${arity.getMessage}")
  }

  test("a spark.sql user can reach a stored ANN index: SQL probe == Scala probe, and hits JOIN other views") {
    val base = java.nio.file.Files.createTempDirectory("graft-sqlann")
    val idx = base.resolve("ivf").toString
    try {
      val e = Tables(spark, sf001, "embeddings")
      graft.queries.Similarity.writeIvfIndex(e, idx, iters = 2)
      val qvec = e.where(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toArray
      graft.queries.Similarity.sqlRegister(spark, idx, "ann", qvec, nprobe = 4)

      val viaSql = spark.sql(
        """SELECT vec_id, sim FROM ann_hits
          |WHERE vec_id <> 0 ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val viaScala = graft.queries.Similarity
        .probeStoredIvf(spark, idx, qvec, nprobe = 4)
        .where(col("vec_id") =!= 0)
        .orderBy(col("sim").desc, col("vec_id")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(viaSql == viaScala, "SQL probe must be row-identical to the Scala probe")

      // the POINT of the SQL surface: hits compose with other SQL views
      e.createOrReplaceTempView("emb")
      val joined = spark.sql(
        """SELECT h.vec_id, e.label FROM ann_hits h JOIN emb e USING (vec_id)
          |WHERE h.vec_id <> 0 ORDER BY h.sim DESC, h.vec_id LIMIT 5""".stripMargin)
        .collect()
      assert(joined.length == 5 && joined.forall(!_.isNullAt(1)),
        "index hits must join metadata views in plain SQL")
      assert(spark.sql("SELECT count(*) FROM ann_centroids").head().getLong(0) > 0)

      // batch form: a SQL-created query view probes in one registration
      spark.sql("""SELECT vec_id AS q_id, CAST(embedding AS ARRAY<DOUBLE>) AS qvec
                  |FROM emb WHERE vec_id < 4""".stripMargin)
        .createOrReplaceTempView("probe_queries")
      graft.queries.Similarity.sqlRegisterBatch(spark, idx, "annb",
        "probe_queries", nprobe = 4)
      val batchSql = spark.sql(
        """SELECT q_id, count(*) AS n FROM annb_hits
          |GROUP BY q_id ORDER BY q_id""".stripMargin).collect()
      assert(batchSql.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L),
        "every batch query serves a candidate set through SQL")

      // parity: the lazy in-plan routing serves the SAME candidates and
      // similarities as the driver-batch probe (exact routing regime)
      val viaLazy = spark.sql(
        """SELECT q_id, vec_id, sim FROM annb_hits
          |ORDER BY q_id, sim DESC, vec_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val viaBatch = graft.queries.Similarity
        .probeStoredIvfBatch(spark, idx, spark.table("probe_queries"), nprobe = 4)
        .orderBy(col("q_id"), col("sim").desc, col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(viaLazy == viaBatch,
        "lazy SQL batch probe must be row-identical to the driver-batch probe")
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("batch probe view is LAZY: new query rows appear without re-registration") {
    val base = java.nio.file.Files.createTempDirectory("graft-sqllazy")
    val idx = base.resolve("ivf").toString
    val qdir = base.resolve("queries").toString
    try {
      val e = Tables(spark, sf001, "embeddings")
      graft.queries.Similarity.writeIvfIndex(e, idx, iters = 2)
      // query table = CATALOG table over a parquet location — the
      // mutable-serving setup: its CatalogFileIndex re-lists after
      // REFRESH TABLE, so the (lazy) probe plan sees appended files at
      // the next SELECT with no re-registration (a path-based temp view
      // would pin an InMemoryFileIndex listing snapshot instead)
      e.where(col("vec_id") < 2)
        .select(col("vec_id").as("q_id"),
          col("embedding").cast("array<double>").as("qvec"))
        .write.mode("overwrite").parquet(qdir)
      spark.sql("CREATE TABLE lazy_queries (q_id BIGINT, qvec ARRAY<DOUBLE>) " +
        s"USING parquet LOCATION '$qdir'")
      graft.queries.Similarity.sqlRegisterBatch(spark, idx, "lazyb",
        "lazy_queries", nprobe = 4)
      val before = spark.sql("SELECT DISTINCT q_id FROM lazyb_hits")
        .collect().map(_.getLong(0)).toSet
      assert(before == Set(0L, 1L))
      // new queries arrive; NO re-registration of the probe view
      e.where(col("vec_id") >= 2 && col("vec_id") < 4)
        .select(col("vec_id").as("q_id"),
          col("embedding").cast("array<double>").as("qvec"))
        .write.mode("append").parquet(qdir)
      spark.sql("REFRESH TABLE lazy_queries")
      val after = spark.sql("SELECT DISTINCT q_id FROM lazyb_hits")
        .collect().map(_.getLong(0)).toSet
      assert(after == Set(0L, 1L, 2L, 3L),
        s"appended queries must flow through the registered probe view: $after")
    } finally {
      spark.sql("DROP TABLE IF EXISTS lazy_queries")
      graft.StoredArtifacts.deleteTree(base.toString)
    }
  }

  test("SQL probe through the sharded HNSW graph tier == Scala probe") {
    val base = java.nio.file.Files.createTempDirectory("graft-sqlhnsw")
    val idx = base.resolve("hnsw").toString
    try {
      val e = Tables(spark, sf001, "embeddings")
      graft.queries.HnswAnn.writeHnswIndex(e, idx, shards = 4)
      e.createOrReplaceTempView("emb_hnsw")
      spark.sql("""SELECT vec_id AS q_id, CAST(embedding AS ARRAY<DOUBLE>) AS qvec
                  |FROM emb_hnsw WHERE vec_id < 3""".stripMargin)
        .createOrReplaceTempView("hnsw_queries")
      graft.queries.HnswAnn.sqlRegister(spark, idx, "hnsw", "hnsw_queries",
        k = 8, ef = 64)
      val viaSql = spark.sql(
        """SELECT q_id, vec_id, sim FROM hnsw_hits
          |ORDER BY q_id, sim DESC, vec_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val viaScala = graft.queries.HnswAnn
        .probeHnsw(spark, idx, spark.table("hnsw_queries"), k = 8, ef = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(viaSql == viaScala,
        "SQL graph probe must be row-identical to the Scala probe")
      assert(viaSql.map(_._1).distinct.sorted == Seq(0L, 1L, 2L))
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("SQL probe through a MANIFEST index resolves the live generation minus tombstones") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sqlmanifest")
    val idx = base.resolve("ivf").toString
    try {
      val standing = (for { c <- 0 until 3; j <- 0 until 5 } yield {
        val v = Array.fill(6)(0.0f); v(c) = 1.0f; v(3) = 0.01f * (j + 1)
        ((c * 10 + j).toLong, v, s"c$c")
      }).toDF("vec_id", "embedding", "label")
      graft.queries.AnnManifest.init(standing, idx, iters = 1)
      graft.queries.AnnManifest.delete(Seq(1L).toDF("vec_id"), idx, "del1")
      val q = Array(1.0, 0, 0, 0, 0, 0)
      graft.queries.Similarity.sqlRegister(spark, idx, "mann", q, nprobe = 3)
      val ids = spark.sql("SELECT vec_id FROM mann_hits ORDER BY vec_id")
        .collect().map(_.getLong(0)).toSet
      val scala = graft.queries.AnnManifest.probe(spark, idx, q, nprobe = 3)
        .collect().map(_.getLong(0)).toSet
      assert(ids == scala, "SQL manifest probe must equal the Scala manifest probe")
      assert(!ids.contains(1L), "SQL hits must respect committed tombstones")
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("lakehouse zone index: SQL views equal the Scala pruned read") {
    val docs = graft.Tables(spark, sf001, "documents")
    val maxId = docs.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col("doc_id"))).collect()(0).getLong(0)
    val (lo, hi) = (maxId / 6, maxId / 2)
    graft.queries.Lakehouse.sqlRegister(spark, sf001, "lk", lo, hi)
    // stats view answers the pruning question a SQL planner would ask
    val sqlFiles = spark.sql(
      s"SELECT file FROM lk_zone_stats WHERE min_id <= $hi AND max_id >= $lo")
      .collect().map(_.getString(0)).toSet
    val (_, stats) = graft.queries.Lakehouse.ensureZoneIndex(spark, sf001)
    assert(sqlFiles == graft.queries.Lakehouse.zoneSelect(stats, lo, hi).toSet)
    assert(sqlFiles.size < stats.count(), "the range must actually prune")
    // the pre-bound range view returns exactly the naive filter's rows
    val sqlRows = spark.sql("SELECT doc_id FROM lk_zone_range ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    val naive = docs.where(org.apache.spark.sql.functions.col("doc_id")
        .between(lo, hi))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(sqlRows == naive && sqlRows.nonEmpty)
  }

  test("SQL probe through the near-dup posting index == Scala probe, lazily re-resolved") {
    val base = java.nio.file.Files.createTempDirectory("graft-sqldedup")
    val idx = base.resolve("postings").toString
    try {
      val d = Tables(spark, sf001, "documents")
      graft.queries.Dedup.writeAllPairsIndex(
        d.where(org.apache.spark.sql.functions.col("source") =!= "src0"), idx)
      val batchDir = base.resolve("batch").toString
      d.where(org.apache.spark.sql.functions.col("source") === "src0" &&
          org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
        .select("doc_id", "text")
        .write.parquet(batchDir)
      spark.read.parquet(batchDir).createOrReplaceTempView("dedup_batch")
      graft.queries.Dedup.sqlRegister(spark, idx, "dd", "dedup_batch")
      val viaSql = spark.sql(
        "SELECT batch_id, standing_id FROM dd_pairs ORDER BY 1, 2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val viaScala = graft.queries.Dedup
        .probeAllPairsIndex(spark.table("dedup_batch"), idx)
        .select("batch_id", "standing_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(viaSql == viaScala,
        "SQL near-dup probe must be row-identical to the Scala probe")
      // laziness: rows landing in the query table's backing files appear
      // at the NEXT select with no re-registration
      d.where(org.apache.spark.sql.functions.col("source") === "src0" &&
          org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
        .select("doc_id", "text")
        .write.mode("append").parquet(batchDir)
      spark.catalog.refreshByPath(batchDir)
      val grown = spark.sql("SELECT COUNT(DISTINCT batch_id) FROM dd_pairs")
        .head().getLong(0)
      val full = graft.queries.Dedup
        .probeAllPairsIndex(spark.read.parquet(batchDir), idx)
        .select("batch_id").distinct().count()
      assert(grown == full, "registered view must re-resolve the grown batch")
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }
}
