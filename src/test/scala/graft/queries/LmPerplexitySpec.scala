package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The stored bigram LM's perplexity serving path on planted corpora:
  * exact backoff arithmetic, in-distribution vs junk ordering, and
  * deterministic serving from the persisted artifact.
  */
class LmPerplexitySpec extends SparkSpec {

  // training corpus: one phrase repeated until every bigram clears the
  // >= 10 floor; a junk doc of unseen tokens; a single-token doc
  private def corpus = {
    import spark.implicits._
    val clean = (0 until 12).map(i =>
      (i.toLong, ("the cat sat on the mat " * 5).trim))
    val junk = Seq((100L, "zz1 zz2 zz3 zz4 zz5 zz6"))
    val tiny = Seq((101L, "solo"))
    (clean ++ junk ++ tiny).toDF("doc_id", "text")
  }

  test("junk text scores the penalty ceiling, in-distribution text scores low") {
    val store = Files.createTempDirectory("graft-lm").toString
    // train on the clean slice ONLY, so the junk doc's prefixes really are
    // unknown to the model (training on everything would hand each zz
    // token a prefix-table row and soften the penalty)
    Retrieval.writeLmIndex(corpus.where(col("doc_id") < 100), store)
    val r = Retrieval.perplexityFromLm(corpus, spark, store).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(3)))).toMap

    val (nClean, pplClean) = r(0L)
    val (nJunk, pplJunk) = r(100L)
    assert(nClean == 29, s"5x6 tokens -> 29 bigrams, got $nClean")
    assert(nJunk == 5)
    // the phrase LM is near-deterministic: only the->cat / the->mat split
    // probability mass, so ppl stays close to 1
    assert(pplClean < 1.5,
      s"in-distribution ppl must sit near 1, got $pplClean")
    assert(!r.contains(101L), "single-token docs have no bigrams and drop out")

    // junk transitions all have UNKNOWN prefixes: p_eff = 1/V exactly, so
    // ppl = V (V read from the artifact: the 5 distinct clean prefixes)
    val v = spark.read.parquet(s"$store/prefix").count().toDouble
    assert(v == 5.0)
    assert(math.abs(pplJunk - v) < 1e-9,
      s"all-unknown-prefix doc must score exactly V=$v, got $pplJunk")
  }

  test("serving from the stored artifact is deterministic and matches a fresh build") {
    val store1 = Files.createTempDirectory("graft-lm").toString
    val store2 = Files.createTempDirectory("graft-lm").toString
    Retrieval.writeLmIndex(corpus, store1)
    Retrieval.writeLmIndex(corpus, store2)
    val a = Retrieval.perplexityFromLm(corpus, spark, store1)
      .select(col("doc_id"), col("n_bigrams"), round(col("ppl"), 9)).collect()
    val b = Retrieval.perplexityFromLm(corpus, spark, store2)
      .select(col("doc_id"), col("n_bigrams"), round(col("ppl"), 9)).collect()
    assert(a.toSeq == b.toSeq)
  }
}
