package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Recall checks for the approximate similarity paths against the exact
  * brute-force baseline (their correctness gate — no SQL oracle exists for
  * hash/probe-seeded algorithms), plus a sanity check that a corrupted
  * bucketing function is actually caught by these gates.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val exactTop20: Set[Long] =
    SparkEntry.queries("x06_cosine_topk")(spark, sf001)
      .collect().map(_.getLong(0)).toSet

  test("LSH ANN recalls >= 0.6 of the exact top-20") {
    val ann = SparkEntry.queries("x07_ann_lsh_topk")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    assert(ann.size == 20)
    val recall = (ann & exactTop20).size / 20.0
    assert(recall >= 0.6, s"LSH recall too low: $recall")
  }

  test("multiprobe LSH: candidates strictly contain single-probe at equal tables, recall holds at half of x07's") {
    val e = Tables(spark, sf001, "embeddings")
    val bucketed = e
      .select(col("vec_id"),
        posexplode(VectorOps.lshBuckets(col("embedding"), nPlanes = 4, nTables = 8)))
      .select(col("vec_id"), col("pos").as("tbl"), col("col").as("bucket"))
    // single-probe at the SAME 8 tables
    val qb = bucketed.where(col("vec_id") === 0).select("tbl", "bucket")
    val single = bucketed.join(broadcast(qb), Seq("tbl", "bucket"))
      .where(col("vec_id") =!= 0).select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val multi = Similarity.multiprobeCandidates(bucketed, qId = 0L, nPlanes = 4)
      .collect().map(_.getLong(0)).toSet
    assert(single.subsetOf(multi),
      "perturbation radius 1 includes the unperturbed bucket's candidates")
    assert(multi.size > single.size,
      s"multiprobe must widen the candidate set: ${multi.size} vs ${single.size}")

    // the registered x109 — 8 multiprobed tables — clears x07's recall bar
    // with HALF of x07's 16-table index footprint
    val ann = SparkEntry.queries("x109_ann_lsh_multiprobe")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    assert(ann.size == 20)
    val recall = (ann & exactTop20).size / 20.0
    assert(recall >= 0.6, s"multiprobe recall too low: $recall")
  }

  test("IVF ANN recalls >= 0.6 of the exact top-20") {
    val ivf = SparkEntry.queries("x07b_ann_ivf_topk")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.size == 20)
    val recall = (ivf & exactTop20).size / 20.0
    assert(recall >= 0.6, s"IVF recall too low: $recall")
  }

  test("every LSH table contributes overlapping candidates") {
    // per-table overlap: each of the 16 tables alone must recover part of
    // the exact top-20 — a single dead/broken table drags the union recall
    // down without necessarily failing it, so pin each table individually.
    val e = Tables(spark, sf001, "embeddings")
    val bucketed = e.select(col("vec_id"),
      posexplode(VectorOps.lshBuckets(col("embedding"), nPlanes = 4, nTables = 16)))
      .select(col("vec_id"), col("pos").as("tbl"), col("col").as("bucket"))
    val q = bucketed.where(col("vec_id") === 0)
      .withColumnRenamed("bucket", "qbucket").drop("vec_id")
    val perTable = bucketed.join(q, Seq("tbl"))
      .where(col("bucket") === col("qbucket") && col("vec_id") =!= 0)
      .select("tbl", "vec_id")
      .collect().groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    (0 until 16).foreach { t =>
      val cands = perTable.getOrElse(t, Set.empty)
      val hits = (cands & exactTop20).size
      assert(hits >= 1, s"table $t recovered only $hits of exact top-20")
    }
  }

  test("a sign-flipped query bucketing fails the recall gate") {
    // corrupt ONLY the query side's bucketing (negate the vector => all
    // hyperplane signs flip => query lands in the antipodal bucket). True
    // neighbors no longer share its buckets, so recall must collapse — this
    // proves the >= 0.6 gates above genuinely constrain the bucket function.
    val e = Tables(spark, sf001, "embeddings")
    val corpus = e.select(col("vec_id"),
      posexplode(VectorOps.lshBuckets(col("embedding"), nPlanes = 4, nTables = 16)))
      .select(col("vec_id"), col("pos").as("tbl"), col("col").as("bucket"))
    val flipped = e.where(col("vec_id") === 0)
      .select(posexplode(VectorOps.lshBuckets(
        expr("transform(embedding, x -> -x)"), nPlanes = 4, nTables = 16)))
      .select(col("pos").as("tbl"), col("col").as("bucket"))
    val cands = corpus.join(flipped, Seq("tbl", "bucket"))
      .where(col("vec_id") =!= 0)
      .select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val recall = (cands & exactTop20).size / 20.0
    assert(recall < 0.6, s"sign-flipped bucketing should not reach the gate: $recall")
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
