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
  * by count desc then (left, right) lexicographic.
  */
class BpeSpec extends SparkSpec {
  import Bpe.BpeMerge

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

  private def refLearn(words: Map[String, Long], nMerges: Int): Seq[(String, String, Long)] = {
    var state = words.toSeq.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val out = mutable.Buffer[(String, String, Long)]()
    var stop = false
    while (out.size < nMerges && !stop) {
      val counts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((syms, n) <- state; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += n
      if (counts.isEmpty) stop = true
      else {
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
      w -> merges.foldLeft(w.map(_.toString).toVector)((s, m) => refMerge(s, m.left, m.right))
    }.toMap
    assert(got == expected)
  }

  test("tied pair counts break to the lexicographically smallest pair") {
    import spark.implicits._
    // (c,d) and (a,b) both have weight 3 — (a,b) must win round 0
    val merges = Bpe.learn(Seq("cd" -> 3L, "ab" -> 3L).toDF("word", "n"), 1)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b")))
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

  test("the kernel is SQL-callable and matches the Column API") {
    graft.functions.SqlFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT bpe_merge_step(array('l', 'o', 'w'), 'l', 'o') AS m")
      .head().getSeq[String](0)
    assert(viaSql == Seq("lo", "w"))
  }
}
