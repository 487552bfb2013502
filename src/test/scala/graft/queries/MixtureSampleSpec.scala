package graft.queries

import graft.SparkSpec

/** Temperature-mixture sampling semantics on a planted skewed corpus: the
  * small source is upweighted to keep-everything while the large source
  * samples near the scale knob, and the whole decision is reproducible
  * (hash thresholds, no RNG state).
  */
class MixtureSampleSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    val big = (0 until 200).map(i => (i.toLong, "tok " * 9 + "tok", "big"))
    val small = (0 until 10).map(i => ((1000 + i).toLong, "tok " * 9 + "tok", "small"))
    (big ++ small).toDF("doc_id", "text", "source")
  }

  test("sqrt temperature keeps the small source whole and samples the big one") {
    val r = CorpusOps.temperatureSample(corpus, scale = 0.5, seed = "t")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    val (bigDocs, bigTok, bigKept, bigKeptTok) = r("big")
    val (smallDocs, _, smallKept, smallKeptTok) = r("small")
    assert(bigDocs == 200 && bigTok == 2000)
    assert(smallDocs == 10)
    // rate_small = min(1, 0.5 * sqrt(2000/100)) = 1 -> everything kept
    assert(smallKept == 10 && smallKeptTok == 100,
      s"small source must be kept whole, got $smallKept docs")
    // rate_big = 0.5: md5 thresholding is uniform; allow wide tolerance
    assert(bigKept > 60 && bigKept < 140,
      s"big source must sample near half, got $bigKept of 200")
    assert(bigKeptTok == bigKept * 10, "token accounting follows the kept docs")
  }

  test("the sample is deterministic across reruns") {
    val a = CorpusOps.temperatureSample(corpus, scale = 0.5, seed = "t").collect()
    val b = CorpusOps.temperatureSample(corpus, scale = 0.5, seed = "t").collect()
    assert(a.toSeq == b.toSeq)
  }
}
