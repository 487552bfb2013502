package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Gates for the sketch/sampling text operators (no SQL oracle — candidate
  * sets and seeded sampling are verified against their own guarantees).
  */
class TextSketchSpec extends SparkSpec {

  test("x20 sketch candidates contain every exact top token (no false negatives)") {
    val exactTop = SparkEntry.queries("x18_frequent_tokens")(spark, sf001)
      .limit(10).collect().map(_.getString(0)).toSet
    val candidates = SparkEntry.queries("x20_frequent_tokens_sketch")(spark, sf001)
      .collect().map(_.getString(0)).toSet
    val missing = exactTop diff candidates
    assert(missing.isEmpty,
      s"freqItems guarantees no false negatives above support; missing: $missing")
  }

  test("x21 stratified sample respects per-stratum fractions and is reproducible") {
    val totals = Tables(spark, sf001, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fractions = Map("en" -> 0.25, "de" -> 1.0, "es" -> 0.5, "fr" -> 0.5, "zh" -> 1.0)

    def sampled(): Map[String, Long] =
      SparkEntry.queries("x21_stratified_sample")(spark, sf001)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val s1 = sampled()
    // fraction-1.0 strata are kept whole (inclusive 'ff' bound really is
    // 256/256); fractional strata land within a generous Bernoulli band
    // around fraction * N (the md5-prefix coin is uniform per doc)
    assert(s1("de") == totals("de") && s1("zh") == totals("zh"))
    for (lang <- Seq("en", "es", "fr")) {
      val expected = fractions(lang) * totals(lang)
      val sd = math.sqrt(totals(lang).toDouble) // > binomial sd for p in [0.25, 0.5]
      assert(math.abs(s1(lang) - expected) <= 4 * sd,
        s"$lang: sampled ${s1(lang)} vs expected ~$expected")
    }
    // content-derived coin => identical sample across runs by construction
    assert(sampled() == s1, "deterministic sampling must be reproducible")
  }

  test("stat.sampleBy (the built-in x21 replaced) keeps its per-stratum contract") {
    // x21 now uses the md5-prefix coin (repartition-stable + oracled); the
    // built-in seeded sampler remains part of the supported API surface —
    // this pins its fraction bounds and same-seed reproducibility.
    val d = Tables(spark, sf001, "documents")
    val fractions = Map("en" -> 0.25, "de" -> 1.0)
    def run(): Map[String, Long] =
      d.stat.sampleBy("lang", fractions, seed = 42L)
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s1 = run()
    val totals = d.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1("de") == totals("de"), "fraction 1.0 keeps the stratum whole")
    assert(!s1.contains("es"), "unlisted strata are dropped entirely")
    val sd = math.sqrt(totals("en").toDouble)
    assert(math.abs(s1("en") - 0.25 * totals("en")) <= 4 * sd)
    assert(run() == s1, "same seed, same partitioning => same sample")
  }

  test("x24 hashed-shingle contamination counts equal the string-shingle form") {
    // x24 joins on 64-bit ShingleHashes kernel hashes; the DuckDB oracle
    // (and this reference reconstruction) uses exact string 6-grams. The
    // two agree unless two distinct 6-token windows collide in 64 bits —
    // this pins the agreement end to end on the fixture corpus.
    val d = Tables(spark, sf001, "documents")
    val ngrams = expr(
      "transform(sequence(1, greatest(size(split(text, ' ')) - 5, 1)), " +
        "i -> array_join(slice(split(text, ' '), i, 6), ' '))")
    val sh = d.select(col("doc_id"), explode(array_distinct(ngrams)).as("shingle"))
    val bench = sh.where(col("doc_id") < 50).select("shingle").distinct()
    val stringForm = sh.where(col("doc_id") >= 50)
      .join(broadcast(bench), "shingle")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hashForm = SparkEntry.queries("x24_decontaminate")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashForm == stringForm,
      s"hash-join contamination diverged from string-join form:\n" +
        s"hash=$hashForm\nstring=$stringForm")
  }

  test("x39 Bloom decontamination: superset of exact x24, bounded over-flagging") {
    val exact = SparkEntry.queries("x24_decontaminate")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = SparkEntry.queries("x39_decontaminate_bloom")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Bloom guarantee: NO false negatives — every exactly-contaminated doc
    // is flagged, and with at least as many hits (collisions only add)
    val missing = exact.keySet diff bloom.keySet
    assert(missing.isEmpty, s"Bloom filter lost contaminated docs: $missing")
    for ((id, n) <- exact)
      assert(bloom(id) >= n, s"doc $id: bloom hits ${bloom(id)} < exact $n")
    // fpp 1% on a 500-doc corpus: over-flagged docs must stay a small tail
    val nDocs = Tables(spark, sf001, "documents").count()
    val extra = bloom.keySet.size - exact.keySet.size
    assert(extra <= math.max(5L, nDocs / 20).toInt,
      s"too many false-positive docs: $extra of $nDocs")
  }

  test("x39's membership probe is the native codegen'd expression, not a UDF") {
    val df = SparkEntry.queries("x39_decontaminate_bloom")(spark, sf001)
    df.collect() // exercises the generated code path end to end
    val exprs = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect { case e => e })
    }.flatten
    assert(exprs.exists(_.isInstanceOf[graft.functions.BloomMightContainLong]),
      "x39 must probe the sketch through BloomMightContainLong")
    assert(!exprs.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF]),
      "the Bloom probe must not fall back to a Scala UDF")
  }
}
