package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Range (radius) search over the stored IVF index — x100. The radius form
  * is deterministic GIVEN the index (cell selection and the scanned cell
  * set are index-pure), so the gates here are exact set equations, not
  * statistical bounds: soundness against driver-computed cosines,
  * completeness within the probed cells, and a recall floor against the
  * global exact range set that only the probe subset can lose.
  */
class RangeSearchSpec extends SparkSpec {

  private val TAU = 0.3

  /** (id -> unit vector) for the whole sf0.001 corpus — 500×64, driver-sized. */
  private lazy val unitVecs: Map[Long, Array[Double]] = {
    val rows = Tables(spark, sf001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    rows.map { case (id, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      id -> v.map(_ / n)
    }.toMap
  }

  private def cos(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("range search: sound, complete within probed cells, and above the recall floor") {
    val base = Files.createTempDirectory("graft-ivfrange")
    val idx = base.resolve("ivf").toString
    try {
      val e = Tables(spark, sf001, "embeddings")
      Similarity.writeIvfIndex(e, idx, iters = 2)
      import spark.implicits._
      val qids = (0L until 8L).toSeq
      val queries = qids
        .map(q => (q, unitVecs(q).toSeq)) // unit vectors: cosine unchanged
        .toDF("q_id", "qvec")

      val got = Similarity.rangeSearchBatch(spark, idx, queries, nprobe = 6, tau = TAU)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

      // soundness: every returned pair is truly within the radius, and the
      // kernel's similarity agrees with driver arithmetic
      for ((q, id, sim) <- got) {
        val exact = cos(unitVecs(q), unitVecs(id))
        assert(math.abs(sim - exact) < 1e-9, s"($q,$id): kernel $sim != exact $exact")
        assert(sim >= TAU, s"($q,$id): sim $sim below tau")
      }

      // completeness within the probed cells: the range result is EXACTLY
      // the unfiltered batch probe thresholded at tau — nothing scanned is
      // dropped, nothing unscanned invented
      val cands = Similarity.probeStoredIvfBatch(spark, idx, queries, nprobe = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSet == cands.filter(_._3 >= TAU).toSet,
        "range result must equal the thresholded candidate set")

      // recall floor vs the GLOBAL exact range set (union over the batch):
      // only probe-subset misses may lose pairs, same 0.5+ regime as the
      // top-k serving gates
      val exactPairs = for {
        q <- qids
        (id, v) <- unitVecs if id != q
        if cos(unitVecs(q), v) >= TAU
      } yield (q, id)
      val gotPairs = got.filter { case (q, id, _) => q != id }
        .map { case (q, id, _) => (q, id) }.toSet
      assert(exactPairs.nonEmpty, "fixture must have in-radius pairs at tau")
      val recall = (gotPairs & exactPairs.toSet).size.toDouble / exactPairs.size
      assert(recall >= 0.5, s"range recall too low: $recall")
    } finally graft.StoredArtifacts.deleteTree(base.toString)
  }

  test("x100 registry entry returns in-radius neighbors deterministically") {
    val got = SparkEntry.queries("x100_ann_range_search")(spark, sf001).collect()
    assert(got.nonEmpty, "fixture range query must find in-radius pairs")
    for (r <- got) {
      assert(r.getLong(1) != r.getLong(0), "self matches are excluded")
      assert(r.getDouble(2) >= TAU, s"row below tau: $r")
    }
    // sim-descending within each query group (the registered ordering)
    for ((_, rows) <- got.groupBy(_.getLong(0))) {
      val sims = rows.map(_.getDouble(2)).toSeq
      assert(sims == sims.sorted.reverse, "per-query rows must be sim-descending")
    }
    val again = SparkEntry.queries("x100_ann_range_search")(spark, sf001).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "range serving must be deterministic across invocations")
  }
}
