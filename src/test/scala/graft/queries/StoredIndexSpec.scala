package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** x58's production claim, demonstrated end to end: the tf-enriched posting
  * index written as a STORED artifact (sorted by token so row-group stats
  * cluster by term), read back with the query's term filter pushed into the
  * parquet scan, and scored through the same bm25Rank tail — producing the
  * scan path's exact answer. At 100 TB this is the plan that never touches
  * document text at query time.
  */
class StoredIndexSpec extends SparkSpec {

  test("stored posting index: term filter pushes to the scan; scores match the scan path") {
    val base = Files.createTempDirectory("graft-index")
    val out = base.resolve("postings").toString
    try {
      val d = Tables(spark, sf001, "documents")
      Retrieval.scoredIndex(d, segWidth = 64L)
        .sortWithinPartitions("token") // cluster row-group min/max by term
        .write.mode("overwrite").parquet(out)

      val qterms = Seq("vector", "window", "scan")
      val stored = spark.read.parquet(out).where(col("token").isin(qterms: _*))
      stored.collect()
      val plan = stored.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [") && plan.contains("In(token"),
        s"term predicate must reach the parquet scan as a pushed filter:\n$plan")

      // read path equivalence: postings from disk -> same bm25Rank tail ->
      // byte-identical scores and ranking vs the scan-fed x46
      val tf = stored
        .select(col("token"), explode(col("postings")).as("p"))
        .select(col("p.doc_id").as("doc_id"), col("token"), col("p.tf").as("tf"))
      val fromDisk = Retrieval.bm25Rank(d, tf).collect().toSeq
      val fromScan = SparkEntry.queries("x46_bm25_rank")(spark, sf001).collect().toSeq
      assert(fromDisk == fromScan,
        "stored-index BM25 must equal the scan-path ranking row for row")
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("stored BPE merge table: x63 serves x61's exact answer with zero training rounds") {
    import graft.operators.Bpe
    val base = Files.createTempDirectory("graft-bpe")
    val store = base.resolve("merges").toString
    try {
      val d = Tables(spark, sf001, "documents")
      val vocab = d.select(explode(split(col("text"), " ")).as("word"))
        .where(length(col("word")) >= 1)
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
      val trained = Bpe.learn(vocab, nMerges = 10)
      Bpe.writeMerges(spark, trained, store)

      // round trip is exact — rank order, symbols, counts
      spark.sparkContext.setJobGroup("bpe-load", "merge-table load")
      val loaded = Bpe.readMerges(spark, store)
      spark.sparkContext.clearJobGroup()
      assert(loaded == trained, "stored merge table must round-trip exactly")

      // loading is a READ, not a training loop: one parquet collect — the
      // 10-merge trainer alone launches 10+ driver-coordinated jobs
      val jobs = graft.SparkSpec.jobsInGroup(spark, "bpe-load")
      assert(jobs > 0 && jobs <= 3,
        s"merge-table load ran $jobs jobs — is it re-training?")

      // the serving query (x63, shared artifact built on first touch) is
      // row-identical to the inline-trained x61 — three physical paths
      // (x56 fold, x61 inline-trained segmentation, x63 stored-vocab
      // segmentation), one result
      val fromStore = graft.SparkEntry.queries("x63_bpe_tokenize_stored")(spark, sf001)
        .collect().map(_.toSeq).toSeq
      val inline = graft.SparkEntry.queries("x61_bpe_tokenize_scale")(spark, sf001)
        .collect().map(_.toSeq).toSeq
      assert(fromStore.nonEmpty && fromStore == inline,
        "stored-vocab tokenization must equal the inline-trained path row for row")

      // and the apply side is the single-node kernel, never a per-rank fold
      import graft.functions.{BpeApplyAll, BpeMergeStep}
      val opt = graft.SparkEntry.queries("x63_bpe_tokenize_stored")(spark, sf001)
        .queryExecution.optimizedPlan
      val exprs = opt.collect { case p =>
        p.expressions.flatMap(_.collect { case e => e })
      }.flatten
      assert(exprs.exists(_.isInstanceOf[BpeApplyAll]))
      assert(!exprs.exists(_.isInstanceOf[BpeMergeStep]))
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("stored bigram LM: x59 scoring from the persisted table is one corpus scan") {
    // x59's deployment shape (its scaladoc's honest caveat made concrete):
    // with the floored LM persisted at build time, scoring is a single
    // narrow corpus scan + broadcast join — and identical to the in-query
    // two-scan form
    val base = Files.createTempDirectory("graft-lm")
    val out = base.resolve("bigram_lm").toString
    try {
      val d = Tables(spark, sf001, "documents")
      val bg = d.select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), explode(expr(
          "zip_with(slice(w, 1, greatest(size(w) - 1, 0)), " +
            "slice(w, 2, greatest(size(w) - 1, 0)), " +
            "(a, b) -> struct(a as w1, b as w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
        .where(col("c") >= 10)
        .select(col("w1"), col("w2"), lit(1L).as("known"))
        .write.mode("overwrite").parquet(out)

      val lm = spark.read.parquet(out)
      val scored = bg.join(broadcast(lm), Seq("w1", "w2"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(coalesce(col("known"), lit(0L))).cast("long").as("n_known"))
        .withColumn("coverage",
          col("n_known").cast("double") / col("n_bigrams").cast("double"))
        .orderBy("doc_id")
      val rows = scored.collect().toSeq
      // exactly one documents scan in the scoring plan (the LM comes from
      // its own stored parquet)
      val docScans = SparkSpec.allPlanNodes(scored.queryExecution.executedPlan)
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
        .filter(_.metadata.get("Location").exists(_.contains("documents")))
      assert(docScans.size == 1,
        s"stored-LM scoring must scan the corpus once, found ${docScans.size}")
      assert(rows == SparkEntry.queries("x59_lm_coverage")(spark, sf001).collect().toSeq,
        "stored-LM scoring must equal the in-query form row for row")
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }
}
