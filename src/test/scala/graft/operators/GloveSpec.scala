package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.Similarity
import org.apache.spark.sql.functions._

/** Gates for the hashed-GloVe embedding trainer: optimization actually
  * descends, the trained geometry separates real collocations from
  * matched-marginal random pairs, the driver/column bucketing twins
  * agree, and the produced doc embeddings flow through the existing ANN
  * serving stack end to end (the x06/x07b shapes) — the engine now
  * PRODUCES the vectors every similarity operator consumes.
  */
class GloveSpec extends SparkSpec {

  private val Buckets = 1024
  private val Dim = 32

  private lazy val docsDf = Tables(spark, sf001, "documents")

  private lazy val trained: (Glove.Model, Seq[Double]) = {
    val cells = Glove.cooccurCells(docsDf, "text", Buckets).localCheckpoint(true)
    Glove.train(cells, Buckets, Dim, iters = 30)
  }

  test("bucketCol and bucketOf agree on every corpus token") {
    val mism = docsDf.select(explode(split(col("text"), " ")).as("w")).distinct()
      .select(col("w"), Glove.bucketCol(col("w"), Buckets).as("b"))
      .collect()
      .count(r => Glove.bucketOf(r.getString(0), Buckets) != r.getInt(1))
    assert(mism == 0, s"$mism tokens bucket differently driver-side vs column-side")
  }

  test("full-batch AdaGrad descends: the loss trace ends well below its start") {
    val (_, trace) = trained
    assert(trace.length == 30)
    assert(trace.last < trace.head * 0.8,
      s"training must reduce the GloVe objective by >20%: ${trace.head} -> ${trace.last}")
  }

  test("trained geometry: PLANTED collocations sit far closer than matched-marginal random pairs") {
    // plant → detect (the x34/x80 discipline): 8 exclusive word pairs
    // (qqp_i always adjacent to qqq_i, never to qqq_j) are appended to
    // every third document; after training, the real pairings must sit
    // measurably closer in cosine than the SAME WORDS cross-paired — a
    // matched-marginal baseline, so the margin is collocation signal, not
    // word-frequency artifact. The fixture's natural vocabulary is tiny
    // (~931 co-occurrence cells), so the planted signal is what makes
    // this a sharp gate rather than a noise read.
    val phrase = concat(lit(" qqp"), pmod(col("doc_id"), lit(8)),
      lit(" qqq"), pmod(col("doc_id"), lit(8)),
      lit(" qqp"), pmod(col("doc_id"), lit(8)),
      lit(" qqq"), pmod(col("doc_id"), lit(8)))
    val aug = docsDf.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, concat(col("text"), phrase))
        .otherwise(col("text")).as("text"))
    val cells = Glove.cooccurCells(aug, "text", Buckets).localCheckpoint(true)
    val (model, _) = Glove.train(cells, Buckets, Dim, iters = 100, lr = 0.1)
    val planted = (0 until 8).map(i => (s"qqp$i", s"qqq$i"))
      .filter { case (a, b) =>
        Glove.bucketOf(a, Buckets) != Glove.bucketOf(b, Buckets) }
    val crossed = (0 until 8).map(i => (s"qqp$i", s"qqq${(i + 3) % 8}"))
      .filter { case (a, b) =>
        Glove.bucketOf(a, Buckets) != Glove.bucketOf(b, Buckets) }
    def avgCos(ps: Seq[(String, String)]): Double =
      ps.map { case (a, b) =>
        model.cosine(Glove.bucketOf(a, Buckets), Glove.bucketOf(b, Buckets))
      }.sum / ps.length
    val real = avgCos(planted)
    val fake = avgCos(crossed)
    assert(real > fake + 0.2,
      s"planted collocations must separate sharply: real=$real cross-paired=$fake")
  }

  test("doc embeddings flow through the ANN stack: planted near-dup found via brute cosine AND a stored IVF probe") {
    val (model, _) = trained
    // plant a near-dup of doc 0 under a fresh id, embed everything
    val d0 = docsDf.where(col("doc_id") === 0).select(col("text")).head().getString(0)
    val planted = docsDf.select(col("doc_id"), col("text"))
      .unionAll(spark.createDataFrame(Seq((100000L, d0))).toDF("doc_id", "text"))
    val emb = Glove.docEmbeddings(planted, "doc_id", "text", model)
      .localCheckpoint(true)
    val dims = emb.select(size(col("embedding"))).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq == Seq(Dim), s"every doc embeds to dim $Dim, got ${dims.toSeq}")

    // x06 shape: brute-force cosine against doc 0's vector
    val qvec = emb.where(col("id") === 0)
      .select(col("embedding")).head().getSeq[Double](0).toArray
    val qnorm = math.sqrt(qvec.map(x => x * x).sum)
    val brute = emb.where(col("id") =!= 0)
      .select(col("id"),
        graft.functions.VectorOps.cosinePreNorm(col("embedding"),
          typedLit(qvec), lit(qnorm)).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(5).collect()
    assert(brute.head.getLong(0) == 100000L && brute.head.getDouble(1) > 0.999,
      s"the planted identical-text doc must be the top brute-cosine hit: " +
        brute.map(r => (r.getLong(0), r.getDouble(1))).toSeq)

    // x07b/x62 shape: the SAME vectors build a stored IVF index and the
    // planted dup surfaces through the partition-pruned probe
    val base = java.nio.file.Files.createTempDirectory("graft-glove-ivf")
    try {
      val idx = base.resolve("ivf").toString
      val labeled = emb.select(col("id").as("vec_id"), col("embedding"),
        pmod(col("id"), lit(3)).cast("string").as("label"))
      Similarity.writeIvfIndex(labeled, idx, iters = 2)
      val hits = Similarity.probeStoredIvf(spark, idx, qvec, nprobe = 2)
        .where(col("vec_id") =!= 0)
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(5).collect()
      assert(hits.head.getLong(0) == 100000L,
        s"the planted dup must top the stored-IVF probe: " +
          hits.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("x112 registry entry scores the x99 collocations deterministically from the stored model") {
    val got = SparkEntry.queries("x112_glove_embeddings")(spark, sf001).collect()
    assert(got.length >= 30, s"expected the collocation table, got ${got.length} rows")
    val again = SparkEntry.queries("x112_glove_embeddings")(spark, sf001).collect()
    assert(got.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      again.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq,
      "serving from the stored model must be deterministic")
  }
}
