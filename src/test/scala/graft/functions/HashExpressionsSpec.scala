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
}
