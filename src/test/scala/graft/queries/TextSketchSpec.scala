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
    // fraction-1.0 strata are kept whole; fractional strata land within a
    // generous Bernoulli band around fraction * N (binomial sd ~ sqrt(N)/2)
    assert(s1("de") == totals("de") && s1("zh") == totals("zh"))
    for (lang <- Seq("en", "es", "fr")) {
      val expected = fractions(lang) * totals(lang)
      val sd = math.sqrt(totals(lang).toDouble) // > binomial sd for p in [0.25, 0.5]
      assert(math.abs(s1(lang) - expected) <= 4 * sd,
        s"$lang: sampled ${s1(lang)} vs expected ~$expected")
    }
    // fixed seed => identical sample across runs
    assert(sampled() == s1, "seeded sampling must be reproducible")
  }
}
