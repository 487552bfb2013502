package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer trainer (Kudo 2018, the SentencePiece
  * `unigram` model) — the other half of production tokenization next to
  * [[Bpe]]: instead of greedy pair merges, a PROBABILISTIC piece
  * vocabulary is fit by EM and pruned to size, and tokenization is the
  * Viterbi segmentation under the fitted piece probabilities
  * ([[graft.functions.UnigramSegment]] — one kernel node, vocabulary
  * rides in the plan, the BpeApplyAll shipping pattern).
  *
  * This implementation runs HARD EM (Viterbi E-step): expected piece
  * counts are the counts of the single best segmentation rather than
  * lattice posteriors. That is the documented simplification (SentencePiece
  * proper runs lattice EM; its own final tokenization is the same Viterbi
  * used here) — and it buys an exactness property lattice EM cannot give:
  * every E-step statistic is an INTEGER count from a deterministic
  * segmentation, so the distributed trainer agrees EXACTLY with a
  * driver-side reference implementation (UnigramSpec's gate, the x56
  * discipline) instead of to within float tolerance.
  *
  * Scale shape, per EM round (the [[Bpe.learn]] cost model):
  *   1. Viterbi-segment the DISTINCT-WORD table through ONE kernel pass —
  *      vocab-bounded, narrow, no shuffle;
  *   2. piece counts: explode(pieces) weighted by word frequency, one
  *      map-side-combined aggregation whose exchange is piece-vocabulary-
  *      sized;
  *   3. M-step + prune on the driver over the piece-count table (a
  *      vocab-sized collect, the KMeans k×dim move): re-estimate
  *      `logProb = ln(count / total)`, drop pieces the best segmentations
  *      stopped using, and cut to `vocabSize` by (count desc, piece asc)
  *      — single characters are NEVER pruned, so every word stays
  *      segmentable (SentencePiece's required-character rule).
  *
  * Seeding: all word substrings of 1..maxPieceLen code points with corpus
  * frequency ≥ minCount (top `seedSize` by (count desc, piece asc)), plus
  * every corpus character unconditionally — the standard frequent-
  * substring seed, computed in one distributed pass.
  */
object UnigramLm {

  /** Fitted vocabulary: parallel (piece, logProb), the kernel's literal
    * payload. `rank` order = (count desc, piece asc) at the final M-step.
    */
  final case class UnigramVocab(pieces: Seq[String], logProbs: Seq[Double]) {
    require(pieces.length == logProbs.length)
    def size: Int = pieces.length
  }

  /** Substring seed counts: (piece, weighted corpus count). Code-point
    * substrings via Spark `substring` — the same character convention as
    * the kernel and [[Bpe.charSymbols]].
    */
  def seedCounts(wordCounts: DataFrame, maxPieceLen: Int): DataFrame = {
    val cols = wordCounts.columns
    wordCounts
      .select(col(cols(0)).cast("string").as("word"),
        col(cols(1)).cast("long").as("n"))
      .where(length(col("word")) >= 1)
      .select(explode(expr(
        s"""flatten(transform(sequence(1, length(word)),
             i -> transform(sequence(i, least(i + ${maxPieceLen - 1}, length(word))),
               j -> substring(word, i, j - i + 1))))""")).as("piece"),
        col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("c"))
  }

  /** Train on a (word, count) DISTINCT-WORD table. Returns the fitted
    * vocabulary and the per-round corpus log-likelihood trace (of the
    * Viterbi segmentations under the round's fitted probabilities).
    */
  def train(wordCounts: DataFrame, vocabSize: Int, emIters: Int,
      maxPieceLen: Int = 6, seedSize: Int = 2000,
      minCount: Long = 2L): (UnigramVocab, Seq[Double]) = {
    require(emIters >= 1 && vocabSize >= 1)
    val cols = wordCounts.columns
    val words = wordCounts
      .select(col(cols(0)).cast("string").as("word"),
        col(cols(1)).cast("long").as("n"))
      .where(length(col("word")) >= 1)
      .localCheckpoint(false)

    // --- seed ---
    val seedRows = seedCounts(words, maxPieceLen)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val chars = seedRows.filter { case (p, _) => p.codePointCount(0, p.length) == 1 }
    val multi = seedRows
      .filter { case (p, c) => p.codePointCount(0, p.length) > 1 && c >= minCount }
      .sortBy { case (p, c) => (-c, p) }
      .take(seedSize)
    var counts: Seq[(String, Long)] = (chars ++ multi).toSeq

    def toVocab(cs: Seq[(String, Long)]): UnigramVocab = {
      val total = cs.map(_._2).sum.toDouble
      val ordered = cs.sortBy { case (p, c) => (-c, p) }
      UnigramVocab(ordered.map(_._1),
        ordered.map { case (_, c) => math.log(c / total) })
    }

    val trace = Seq.newBuilder[Double]
    var vocab = toVocab(counts)
    for (round <- 0 until emIters) {
      // E-step: Viterbi counts over distinct words, weighted by frequency
      val segmented = words.select(col("n"),
        HashFunctions.unigramSegment(col("word"), vocab.pieces, vocab.logProbs)
          .as("pieces"))
      val pieceCounts = segmented
        .select(col("n"), explode(col("pieces")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("n")).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      // corpus log-likelihood of these segmentations under the CURRENT
      // model (Σ count·logProb) — the trace the spec sanity-checks
      val lpMap = vocab.pieces.zip(vocab.logProbs).toMap
      trace += pieceCounts.map { case (p, c) =>
        c * lpMap.getOrElse(p, -1e9) }.sum
      // M-step + prune: chars unconditionally retained; multi-cp pieces
      // cut to vocabSize by (count desc, piece asc)
      val used = pieceCounts.toMap
      // a char the Viterbi stopped using keeps count 1 (floor) — its
      // probability must stay positive for unseen-word coverage
      val charRows = counts
        .filter { case (p, _) => p.codePointCount(0, p.length) == 1 }
        .map { case (p, _) => p -> used.getOrElse(p, 0L).max(1L) }
      val keptMulti = pieceCounts
        .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - charRows.length))
      counts = (charRows.toMap ++ keptMulti.toMap).toSeq
      vocab = toVocab(counts)
    }
    (vocab, trace.result())
  }

  /** Segment a DISTINCT-WORD table once through the fitted model — the
    * [[Bpe.segmentVocab]] serving shape: vocab-bounded kernel work,
    * occurrences join back by word.
    */
  def segmentVocab(vocabDf: DataFrame, wordCol: String,
      model: UnigramVocab): DataFrame =
    vocabDf.select(col(wordCol).cast("string").as("word"))
      .select(col("word"),
        HashFunctions.unigramSegment(col("word"), model.pieces, model.logProbs)
          .as("pieces"))

  /** Persist / load the fitted vocabulary (rank = fitted order). */
  def writeVocab(spark: SparkSession, model: UnigramVocab, path: String): Unit = {
    import spark.implicits._
    model.pieces.indices.map(i => (i, model.pieces(i), model.logProbs(i)))
      .toDF("rank", "piece", "log_prob")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readVocab(spark: SparkSession, path: String): UnigramVocab = {
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("piece"),
        r.getAs[Double]("log_prob")))
      .sortBy(_._1)
    UnigramVocab(rows.map(_._2).toSeq, rows.map(_._3).toSeq)
  }
}
