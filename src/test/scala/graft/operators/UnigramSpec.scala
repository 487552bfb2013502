package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import graft.functions.HashFunctions
import org.apache.spark.sql.functions._

/** Gates for the unigram-LM tokenizer: EXACT agreement of the distributed
  * hard-EM trainer with an independent driver-side reference (the x56
  * discipline — integer Viterbi counts make this an equality, not a
  * tolerance), kernel tie-break semantics including supplementary-plane
  * safety, and the fertility comparison against BPE through x101's shared
  * harness.
  */
class UnigramSpec extends SparkSpec {

  // ---- independent driver reference of the SAME algorithm ----

  private def refCps(word: String): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      buf += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    buf.toArray
  }

  /** Reference Viterbi: maximize Σ logProb, ties → smallest start (longest
    * last piece), unseen single char at −1e9 — the kernel's documented
    * contract, re-derived independently.
    */
  private def refSegment(word: String, lp: Map[String, Double]): Seq[String] = {
    val cps = refCps(word)
    val n = cps.length
    if (n == 0) return Seq.empty
    val maxLen = if (lp.isEmpty) 1 else lp.keys.map(p => refCps(p).length).max
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val prev = new Array[Int](n + 1)
    best(0) = 0.0
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i
        if best(j) > Double.NegativeInfinity) {
      val piece = cps.slice(j, i).mkString
      val score = lp.get(piece) match {
        case Some(p) => best(j) + p
        case None if i - j == 1 => best(j) + -1e9
        case None => Double.NegativeInfinity
      }
      if (score > best(i)) { best(i) = score; prev(i) = j }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) { out += cps.slice(prev(pos), pos).mkString; pos = prev(pos) }
    out.reverse.toSeq
  }

  /** Reference trainer: same seed, same hard-EM, same prune rules, plain
    * Scala over a collected (word, n) table.
    */
  private def refTrain(wordCounts: Seq[(String, Long)], vocabSize: Int,
      emIters: Int, maxPieceLen: Int, seedSize: Int,
      minCount: Long): (Seq[String], Seq[Double]) = {
    val subCounts = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, n) <- wordCounts; cps = refCps(w); i <- cps.indices;
        j <- i until math.min(cps.length, i + maxPieceLen)) {
      val piece = cps.slice(i, j + 1).mkString
      subCounts(piece) = subCounts.getOrElse(piece, 0L) + n
    }
    val chars = subCounts.toSeq.filter { case (p, _) => refCps(p).length == 1 }
    val multi = subCounts.toSeq
      .filter { case (p, c) => refCps(p).length > 1 && c >= minCount }
      .sortBy { case (p, c) => (-c, p) }.take(seedSize)
    var counts: Seq[(String, Long)] = chars ++ multi
    def toVocab(cs: Seq[(String, Long)]): (Seq[String], Seq[Double]) = {
      val total = cs.map(_._2).sum.toDouble
      val ordered = cs.sortBy { case (p, c) => (-c, p) }
      (ordered.map(_._1), ordered.map { case (_, c) => math.log(c / total) })
    }
    var vocab = toVocab(counts)
    for (_ <- 0 until emIters) {
      val lp = vocab._1.zip(vocab._2).toMap
      val used = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, n) <- wordCounts; p <- refSegment(w, lp))
        used(p) = used.getOrElse(p, 0L) + n
      val charRows = counts.filter { case (p, _) => refCps(p).length == 1 }
        .map { case (p, _) => p -> used.getOrElse(p, 0L).max(1L) }
      val keptMulti = used.toSeq
        .filter { case (p, _) => refCps(p).length > 1 }
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - charRows.length))
      counts = (charRows.toMap ++ keptMulti.toMap).toSeq
      vocab = toVocab(counts)
    }
    vocab
  }

  private lazy val wordCountsDf = Tables(spark, sf001, "documents")
    .select(explode(split(col("text"), " ")).as("word"))
    .where(length(col("word")) >= 1)
    .groupBy(col("word")).agg(count(lit(1)).as("n"))

  test("distributed hard-EM agrees EXACTLY with the driver reference: pieces, log-probs, and every segmentation") {
    val (model, trace) = UnigramLm.train(wordCountsDf, vocabSize = 300,
      emIters = 3, maxPieceLen = 6, seedSize = 1000, minCount = 2L)
    val collected = wordCountsDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val (refPieces, refLps) = refTrain(collected, vocabSize = 300,
      emIters = 3, maxPieceLen = 6, seedSize = 1000, minCount = 2L)
    assert(model.pieces == refPieces,
      s"piece inventories diverge: distributed ${model.pieces.take(10)}... " +
        s"vs reference ${refPieces.take(10)}...")
    assert(model.logProbs == refLps,
      "log-probs must agree exactly (identical integer counts, identical ln)")
    assert(trace.length == 3)
    // every distinct word segments identically through kernel vs reference
    val lp = model.pieces.zip(model.logProbs).toMap
    val seg = UnigramLm.segmentVocab(wordCountsDf, "word", model).collect()
    for (r <- seg) {
      val w = r.getString(0)
      assert(r.getSeq[String](1).toSeq == refSegment(w, lp),
        s"word '$w' segments differently in the kernel vs the reference")
    }
  }

  test("kernel semantics: tie-break, unseen-char floor, supplementary-plane safety") {
    import spark.implicits._
    // vocab: ab|c vs a|bc equal score -> prefer longest LAST piece ("a","bc")
    val pieces = Seq("a", "b", "c", "ab", "bc")
    val lps = Seq(-2.0, -2.0, -2.0, -3.0, -3.0)
    val rows = Seq("abc", "zzz", "a😀b").toDF("w")
      .select(col("w"), HashFunctions.unigramSegment(col("w"), pieces, lps).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(rows("abc") == Seq("a", "bc"),
      s"equal-score tie must keep the longest last piece: ${rows("abc")}")
    // unseen chars become floor-prob singleton pieces, never dropped
    assert(rows("zzz") == Seq("z", "z", "z"))
    // the emoji (U+1F600, a surrogate pair in UTF-16) stays one piece
    assert(rows("a😀b") == Seq("a", "😀", "b"),
      s"supplementary-plane char must not split: ${rows("a😀b")}")
  }

  test("x113 fertility harness: unigram-300 compresses at least as well as BPE-10, and better than characters") {
    val uni = SparkEntry.queries("x113_unigram_fertility")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(4), r.getLong(5))).toMap // lang -> (fertility, compression)
    val bpe = SparkEntry.queries("x101_tokenizer_fertility")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(4), r.getLong(5))).toMap
    assert(uni.keySet == bpe.keySet, "both harness runs cover the same langs")
    for ((lang, (_, uComp)) <- uni) {
      val (_, bComp) = bpe(lang)
      assert(uComp < 1000,
        s"$lang: a 300-piece vocab must beat character-level (compression $uComp)")
      assert(uComp <= bComp,
        s"$lang: unigram-300 compression $uComp must not lose to BPE-10 $bComp")
    }
  }

  test("x113 registry entry serves deterministically from the stored vocabulary") {
    val a = SparkEntry.queries("x113_unigram_fertility")(spark, sf001).collect()
    val b = SparkEntry.queries("x113_unigram_fertility")(spark, sf001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.nonEmpty)
  }
}
