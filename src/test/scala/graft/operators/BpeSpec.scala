package graft.operators

import graft.SparkSpec
import graft.functions.HashFunctions
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Gates for the BPE pair-merge trainer: the distributed loop must agree
  * EXACTLY (merge-for-merge, count-for-count) with a driver-side reference
  * implementation of the published algorithm (Sennrich et al. 2016) under
  * the shared conventions — char start symbols, no end-of-word marker,
  * overlapping pair counts, greedy left-to-right application, ties broken
  * by count desc then (left, right) in Unicode code-point order — the
  * reference compares UTF-8 bytes, NOT Java String order, because Spark's
  * binary string order and UTF-16 code-unit order disagree for
  * supplementary-plane symbols (pinned below on a surrogate-pair corpus).
  */
class BpeSpec extends SparkSpec {
  import Bpe.BpeMerge

  /** Unsigned lexicographic UTF-8 byte order = Unicode code-point order =
    * Spark's binary string order.
    */
  private val utf8Order: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    var i = 0
    var r = 0
    while (r == 0 && i < math.min(x.length, y.length)) {
      r = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      i += 1
    }
    if (r != 0) r else java.lang.Integer.compare(x.length, y.length)
  }

  private def refMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** Code-POINT symbolization, matching Spark's substring semantics — a
    * UTF-16 split (w.map(_.toString)) would shear supplementary-plane
    * chars into lone surrogate halves.
    */
  private def charSyms(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  private def refLearn(words: Map[String, Long], nMerges: Int): Seq[(String, String, Long)] = {
    var state = words.toSeq.map { case (w, n) => (charSyms(w), n) }
    val out = mutable.Buffer[(String, String, Long)]()
    var stop = false
    while (out.size < nMerges && !stop) {
      val counts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((syms, n) <- state; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += n
      if (counts.isEmpty) stop = true
      else {
        implicit val pairOrd: Ordering[(Long, String, String)] =
          Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order)
        val ((l, r), c) = counts.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        out += ((l, r, c))
        state = state.map { case (syms, n) => (refMerge(syms, l, r), n) }
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L, "wide" -> 1L)

  test("learned merge table agrees exactly with the reference implementation") {
    import spark.implicits._
    val merges = Bpe.learn(corpus.toDF("word", "n"), nMerges = 8)
    val expected = refLearn(corpus.toMap, 8)
    assert(merges.map(m => (m.left, m.right, m.count)) == expected,
      s"distributed trainer diverged from reference:\n$merges\nvs\n$expected")
    assert(merges.map(_.rank) == merges.indices, "ranks are 0..n-1 in order")
  }

  test("applying the merge table via the kernel reproduces the reference segmentation") {
    import spark.implicits._
    val merges = Bpe.learn(corpus.toDF("word", "n"), nMerges = 8)
    val got = corpus.map(_._1).toDF("word")
      .select(col("word"), Bpe.applyMerges(Bpe.charSymbols(col("word")), merges).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    val expected = corpus.map { case (w, _) =>
      w -> merges.foldLeft(charSyms(w))((s, m) => refMerge(s, m.left, m.right))
    }.toMap
    assert(got == expected)
  }

  test("tied pair counts break to the lexicographically smallest pair") {
    import spark.implicits._
    // (c,d) and (a,b) both have weight 3 — (a,b) must win round 0
    val merges = Bpe.learn(Seq("cd" -> 3L, "ab" -> 3L).toDF("word", "n"), 1)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b")))
  }

  test("tie-break order is Unicode code-point order, pinned beyond the BMP") {
    import spark.implicits._
    // U+FFFD (EF BF BD in UTF-8) vs U+1F600 😀 (F0 9F 98 80, a surrogate
    // pair in UTF-16): code-point order puts U+FFFD FIRST, while Java
    // String.compareTo puts the emoji's 0xD83D lead surrogate first — a
    // reference implementation using naive String ordering diverges here
    val emoji = new String(Character.toChars(0x1F600))
    val corpus = Seq(emoji + "x" -> 3L, "\uFFFDy" -> 3L)
    val merges = Bpe.learn(corpus.toDF("word", "n"), 1)
    assert(merges.map(m => (m.left, m.right)) == Seq(("\uFFFD", "y")),
      s"expected the U+FFFD pair to win the tie, got $merges")
    val expected = refLearn(corpus.toMap, 1)
    assert(merges.map(m => (m.left, m.right, m.count)) == expected,
      "reference (UTF-8 byte order) must agree on the supplementary-plane tie")
  }

  test("training stops early when no adjacent pair remains") {
    import spark.implicits._
    val merges = Bpe.learn(Seq("ab" -> 1L, "c" -> 4L).toDF("word", "n"), nMerges = 5)
    assert(merges.map(m => (m.left, m.right, m.count)) == Seq(("a", "b", 1L)),
      "one merge exhausts this corpus; the trainer must not loop on nothing")
  }

  test("greedy application is left-to-right non-overlapping ('aaa' -> ['aa','a'])") {
    import spark.implicits._
    val out = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
      .select(HashFunctions.bpeMergeStep(col("syms"), "a", "a").as("m"))
      .head().getSeq[String](0)
    assert(out == Seq("aa", "a"))
    // and the overlapping-count convention: 'aaa' contributes (a,a) twice
    val m = Bpe.learn(Seq("aaa" -> 1L).toDF("word", "n"), 1)
    assert(m.map(x => (x.left, x.right, x.count)) == Seq(("a", "a", 2L)))
  }

  test("charSymbols of an empty word is an empty array, not two empty symbols") {
    import spark.implicits._
    // sequence(1, 0) is DESCENDING [1, 0] in Spark — unguarded, "" would
    // symbolize as two empty strings and poison pair counts
    val out = Seq("", "a", "ab").toDF("word")
      .select(col("word"), Bpe.charSymbols(col("word")).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("") == Seq())
    assert(out("a") == Seq("a"))
    assert(out("ab") == Seq("a", "b"))
    // and NULL propagates as NULL (not an empty array) like any column fn
    val nullRow = Seq(Option.empty[String]).toDF("word")
      .select(Bpe.charSymbols(col("word")).as("syms")).head()
    assert(nullRow.isNullAt(0), "charSymbols(NULL) must be NULL")
  }

  test("the kernel is SQL-callable and matches the Column API") {
    graft.functions.SqlFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT bpe_merge_step(array('l', 'o', 'w'), 'l', 'o') AS m")
      .head().getSeq[String](0)
    assert(viaSql == Seq("lo", "w"))
  }
}
