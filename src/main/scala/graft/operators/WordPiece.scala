package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece (Wu et al. 2016) — the greedy longest-match-first tokenizer
  * family (BERT's), completing the engine's production triad next to BPE
  * (merge-order replay, [[Bpe]]) and unigram-LM (Viterbi, [[UnigramLm]]).
  * Application is maximal munch over a TWO-PART vocabulary: word-initial
  * pieces at position 0, `##`-continuation pieces after.
  *
  * Vocabulary derivation: WordPiece training proper optimizes a likelihood
  * criterion close enough to BPE's that production stacks routinely share
  * inventories; here the vocabulary is DERIVED from the engine's own
  * BPE-learned segmentation (the x112 "engine-made" discipline — no
  * external artifacts): a symbol observed word-initial in the BPE
  * segmentation becomes an initial piece, a symbol observed at an interior
  * position becomes a continuation piece, and every single character of
  * the word vocabulary is added to BOTH parts so greedy matching is total
  * (the `[UNK]` branch of the kernel stays a safety net, not a data
  * path — WordPieceSpec pins zero UNKs on the fixtures).
  *
  * Scale shape: vocabulary extraction is two aggregates over the
  * DISTINCT-WORD table (vocab-sized, not corpus-sized); segmentation is
  * the literal-vocab [[graft.functions.WordPieceSegment]] kernel — scan
  * speed, no join.
  */
object WordPiece {

  final case class WpVocab(initial: Seq[String], continuation: Seq[String]) {
    def size: Int = initial.length + continuation.length
  }

  /** Derive the two-part vocabulary from a BPE segmentation of the
    * distinct-word table (`wordCounts`: at least a `word` column).
    */
  def fromBpe(wordCounts: DataFrame, merges: Seq[Bpe.BpeMerge]): WpVocab = {
    val seg = Bpe.segmentVocab(wordCounts, "word", merges)
      .select(posexplode(col("syms")).as(Seq("pos", "sym")))
    val bySlot = seg
      .groupBy(col("sym"))
      .agg(max(when(col("pos") === 0, 1).otherwise(0)).as("asInit"),
        max(when(col("pos") > 0, 1).otherwise(0)).as("asCont"))
      .collect() // vocab-sized: symbols of the learned inventory
    val chars = wordCounts.select(explode(Bpe.charSymbols(col("word"))).as("c"))
      .distinct().collect().map(_.getString(0)) // alphabet-sized
    val init = (bySlot.filter(_.getInt(1) == 1).map(_.getString(0)) ++ chars)
      .distinct.sorted
    val cont = (bySlot.filter(_.getInt(2) == 1).map(_.getString(0)) ++ chars)
      .distinct.sorted
    WpVocab(init.toSeq, cont.toSeq)
  }

  /** Segment the distinct-word table under the literal vocabulary —
    * one kernel call per word, no vocab join (the x101 serving shape).
    */
  def segmentVocab(vocabDf: DataFrame, wordCol: String,
      vocab: WpVocab): DataFrame =
    vocabDf.select(col(wordCol).cast("string").as("word"))
      .select(col("word"),
        HashFunctions.wordPieceSegment(col("word"), vocab.initial,
          vocab.continuation).as("pieces"))

  /** Persist / load the two-part vocabulary. */
  def writeVocab(spark: SparkSession, vocab: WpVocab, path: String): Unit = {
    import spark.implicits._
    (vocab.initial.map(p => (p, "init")) ++
      vocab.continuation.map(p => (p, "cont")))
      .toDF("piece", "part")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readVocab(spark: SparkSession, path: String): WpVocab = {
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getString(0), r.getString(1)))
    WpVocab(rows.filter(_._2 == "init").map(_._1).sorted.toSeq,
      rows.filter(_._2 == "cont").map(_._1).sorted.toSeq)
  }
}
