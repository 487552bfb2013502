package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative BPE (byte-pair-encoding) vocabulary learning over a corpus —
  * the pair-merge trainer (Sennrich et al. 2016, "Neural Machine Translation
  * of Rare Words with Subword Units") expressed as a driver-coordinated
  * Spark loop, the same iterative-operator pattern as
  * [[ConnectedComponents]] (per-round distributed aggregate + tiny driver
  * decision + lazy localCheckpoint to keep the plan from growing with
  * iteration count).
  *
  * Per round:
  *   1. adjacent-pair counts over the DISTINCT-WORD symbol table, weighted
  *      by word frequency — the one shuffle, carrying (left, right,
  *      partial count), vocab-bounded, never corpus-bounded (classic BPE
  *      trains on the word-count table for exactly this reason);
  *   2. the argmax pair comes to the driver (ONE row — this is the k×dim
  *      move KMeans makes, not a corpus collect) with a deterministic
  *      tie-break: count desc, then (left, right) in Unicode CODE-POINT
  *      order (Spark's binary UTF-8 string order — NOT Java String's
  *      UTF-16 code-unit order, which disagrees for supplementary-plane
  *      symbols; BpeSpec pins the convention on a surrogate-pair corpus);
  *   3. the merge is applied to every word's symbols by the native
  *      [[graft.functions.BpeMergeStep]] kernel — narrow, no shuffle.
  *
  * Training stops early if no adjacent pair remains (every word fully
  * merged). Round count is the token-economy knob, not a convergence
  * question, so there is no fixpoint detection to get wrong.
  *
  * Symbols are single characters at round 0 — no end-of-word marker; the
  * whitespace pre-tokenization (x10's convention) already delimits words,
  * and BpeSpec's driver-side reference implementation uses the identical
  * convention, so agreement is exact by construction.
  */
object Bpe {

  /** One learned merge: applying rank order reproduces the segmentation. */
  final case class BpeMerge(rank: Int, left: String, right: String, count: Long) {
    def merged: String = left + right
  }

  /** Character symbols of a word column — round-0 state and the input shape
    * [[applyMerges]] expects. substring is 1-based and per-character. The
    * empty-word guard is load-bearing: Spark's sequence(1, 0) is the
    * DESCENDING [1, 0], so an unguarded transform would turn "" into two
    * empty symbols instead of zero (split on repeated delimiters produces
    * "" words routinely). A NULL word stays NULL (neither branch matches),
    * matching every other column function's null propagation.
    */
  def charSymbols(word: Column): Column =
    when(length(word) >= 1,
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))))
      .when(length(word) === 0, array().cast("array<string>"))

  /** Fold a learned merge table (rank order) over a symbol-array column —
    * the SAME kernel the trainer used, so tokenization cannot drift from
    * training. One nested kernel node PER MERGE: the right shape for a
    * small table (x56's 10 merges), an expression-tree blowup at a
    * production 30k-merge vocabulary — use [[applyMergesAll]] there.
    */
  def applyMerges(syms: Column, merges: Seq[BpeMerge]): Column =
    merges.foldLeft(syms)((c, m) => HashFunctions.bpeMergeStep(c, m.left, m.right))

  /** Scale form of [[applyMerges]]: the WHOLE merge table in ONE
    * [[graft.functions.BpeApplyAll]] kernel call. Plan size is constant in
    * the merge count (the table rides inside the single expression node and
    * ships to executors once with the serialized plan), and per-word cost
    * is O(len²) independent of table size — the kernel applies only the
    * ranks actually present in the word, in exact fold order (BpeSpec pins
    * row-identical agreement with [[applyMerges]] on a 1000-merge learned
    * table).
    */
  def applyMergesAll(syms: Column, merges: Seq[BpeMerge]): Column =
    HashFunctions.bpeApplyAll(syms, merges.map(_.left), merges.map(_.right))

  /** Segment a DISTINCT-WORD vocabulary table through a learned merge table
    * once — the production tokenization shape: the kernel runs per distinct
    * word (vocab-bounded work, Zipf says orders of magnitude smaller than
    * the corpus), and the caller joins the segmentation back to word
    * occurrences by `word` (broadcast when the vocab is small, sort-merge
    * at 100 TB vocab scale — either way the per-occurrence work is a join
    * probe, not a re-segmentation).
    *
    * @param vocab table whose `wordCol` column holds DISTINCT words (the
    *              trainer's word-count table is exactly this shape); rows
    *              are NOT deduplicated here — a duplicated word would fan
    *              out the join.
    * @return (word, syms) — one row per input row, `syms` the BPE symbols
    */
  def segmentVocab(vocab: DataFrame, wordCol: String, merges: Seq[BpeMerge]): DataFrame =
    vocab.select(col(wordCol).cast("string").as("word"))
      .select(col("word"), applyMergesAll(charSymbols(col("word")), merges).as("syms"))

  /** Persist a learned merge table as a parquet artifact — the tokenizer-
    * vocabulary file of the serving architecture: trained once at ingest,
    * loaded by every tokenization job thereafter ([[readMerges]]). One file:
    * the table is merge-count-sized (30k rows for a production tokenizer).
    */
  def writeMerges(spark: SparkSession, merges: Seq[BpeMerge], path: String): Unit = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.count))
      .toDF("rank", "left", "right", "count")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a stored merge table in rank order. The collect is the KMeans
    * k×dim move — a vocab-bounded driver materialization (the table must
    * reach the driver anyway to ride inside the [[applyMergesAll]]
    * expression node), never a corpus one.
    */
  def readMerges(spark: SparkSession, path: String): Seq[BpeMerge] =
    // rank order restored on the driver: a distributed orderBy would add a
    // range-partition sampling job just to sort a merge-count-sized table
    spark.read.parquet(path)
      .collect()
      .map(r => BpeMerge(r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("count")))
      .sortBy(_.rank)
      .toSeq

  /** The deterministic symbol → id table of a learned tokenizer: base
    * characters first in Unicode code-point order (ids 0..C-1 — the UTF-8
    * byte order every other BPE convention in this operator uses), then
    * one id per merge in rank order (id C + rank). This is the standard
    * BPE vocabulary numbering: stable across runs, and ids are BOUNDED by
    * `nChars + nMerges` — NOT dense: duplicate merge surfaces dedupe to
    * the min id (leaving holes), while merge ids are `C + rank`
    * regardless, so a trainer must size its embedding table to
    * `nChars + maxRank + 1`, not to the distinct-symbol count.
    *
    * Two merges can legally produce the SAME surface string ((a,bc) and
    * (ab,c) both yield "abc"); encode joins by symbol, so the table keeps
    * the SMALLEST id per surface form — without the dedupe the encode join
    * would fan out.
    */
  def idVocab(chars: Seq[String], merges: Seq[BpeMerge]): Seq[(String, Int)] = {
    val ordered = chars.distinct.sortBy(_.getBytes("UTF-8").toSeq
      .map(b => (b & 0xff).toChar).mkString) // unsigned byte order
    val all = ordered.zipWithIndex ++
      merges.map(m => m.merged -> (ordered.length + m.rank))
    all.groupBy(_._1).map { case (sym, ids) => sym -> ids.map(_._2).min }.toSeq
  }

  /** Encode a DISTINCT-WORD table to id sequences: segment once through
    * the single-kernel apply ([[segmentVocab]]), map each symbol to its
    * [[idVocab]] id via one broadcast join, reassemble in symbol order. A
    * symbol outside the vocabulary (a character unseen at training time)
    * encodes to -1 — the caller's OOV policy sees it explicitly instead of
    * a silent drop. Same vocab-bounded cost model as segmentation itself;
    * occurrences join back by word.
    *
    * @param ids (symbol, id) — [[idVocab]] as a DataFrame
    * @return (word, ids array<int>)
    */
  def encodeVocabIds(vocab: DataFrame, wordCol: String, merges: Seq[BpeMerge],
      ids: DataFrame): DataFrame =
    segmentVocab(vocab, wordCol, merges)
      .select(col("word"), posexplode(col("syms")))
      .select(col("word"), col("pos").as("spos"), col("col").as("symbol"))
      .join(broadcast(ids), Seq("symbol"), "left")
      .groupBy(col("word"))
      .agg(array_sort(collect_list(
        struct(col("spos"), coalesce(col("id"), lit(-1)).as("id")))).as("sids"))
      .select(col("word"), expr("transform(sids, x -> x.id)").as("ids"))

  /** Learn up to `nMerges` merges from a (word, count) table.
    *
    * @param wordCounts first column: word (string), second: corpus
    *                   frequency (long). Distinct words — the vocab table,
    *                   not the corpus.
    * @return merge table in rank order (may be shorter than `nMerges` if
    *         the corpus runs out of adjacent pairs)
    */
  def learn(wordCounts: DataFrame, nMerges: Int): Seq[BpeMerge] = {
    require(nMerges >= 0, s"nMerges must be >= 0: $nMerges")
    val cols = wordCounts.columns
    var state = wordCounts
      .select(col(cols(0)).cast("string").as("word"), col(cols(1)).cast("long").as("n"))
      .where(length(col("word")) >= 1)
      .select(charSymbols(col("word")).as("syms"), col("n"))
      .localCheckpoint(false)
    // lazy checkpoints, materialized by the NEXT round's pair-count action;
    // each superseded generation is unpersisted once its successor has been
    // materialized (the lag-one discipline ConnectedComponents uses), so
    // the block manager holds at most two vocab generations.
    var prev: DataFrame = null
    val out = Seq.newBuilder[BpeMerge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val top = state.where(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS l, syms[i] AS r))"))
          .as("p"), col("n"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect() // materializes `state`'s checkpoint as a side effect
      if (prev != null) {
        ConnectedComponents.checkpointRdds(prev).foreach(_.unpersist(blocking = false))
        prev = null
      }
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += BpeMerge(rank, l, r, c)
        prev = state
        state = state
          .withColumn("syms", HashFunctions.bpeMergeStep(col("syms"), l, r))
          .localCheckpoint(false)
        rank += 1
      }
    }
    // the final generation (and a possibly never-materialized successor)
    for (df <- Seq(prev, state) if df != null)
      ConnectedComponents.checkpointRdds(df).foreach(_.unpersist(blocking = false))
    out.result()
  }
}
