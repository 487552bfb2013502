package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import graft.functions.HashFunctions
import org.apache.spark.sql.functions._

/** WordPiece correctness gates (no SQL oracle — greedy segmentation under
  * an engine-derived vocabulary): maximal munch, round-trip, total
  * coverage, UNK semantics, and the cross-family fertility comparison.
  */
class WordPieceSpec extends SparkSpec {

  private def fixtureVocab() = {
    val words = Tables(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val merges = Bpe.learn(words, nMerges = 10)
    (words, WordPiece.fromBpe(words, merges))
  }

  test("greedy maximal munch: every piece is the longest vocab match at its position") {
    val (words, vocab) = fixtureVocab()
    val initSet = vocab.initial.toSet
    val contSet = vocab.continuation.toSet
    val segs = WordPiece.segmentVocab(words, "word", vocab).collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val word = r.getString(0)
      val pieces = r.getSeq[String](1)
      // round-trip: strip ## markers and concatenate back to the word
      assert(pieces.map(_.stripPrefix("##")).mkString == word,
        s"round-trip failed for '$word': $pieces")
      // coverage: char fallback makes greedy total on the fixtures
      assert(!pieces.contains("[UNK]"), s"unexpected UNK for '$word'")
      // maximal munch: at each piece boundary, no STRICTLY longer vocab
      // entry matches
      var pos = 0
      pieces.foreach { p =>
        val bare = p.stripPrefix("##")
        val set = if (pos == 0) initSet else contSet
        assert(set.contains(bare), s"'$bare' not in vocabulary part")
        val rest = word.substring(pos)
        val longer = (bare.length + 1 to rest.length)
          .map(rest.substring(0, _)).find(set.contains)
        assert(longer.isEmpty,
          s"'$word'@$pos: took '$bare' but longer '${longer.getOrElse("")}' matches")
        pos += bare.length
      }
    }
  }

  test("a word with no matchable start maps whole to [UNK]") {
    import spark.implicits._
    val seg = Seq("zzz").toDF("word")
      .select(HashFunctions.wordPieceSegment(col("word"),
        Seq("a", "b"), Seq("a", "b")).as("p"))
      .head().getSeq[String](0)
    assert(seg == Seq("[UNK]"))
  }

  test("vocabulary parts are honest: initial from position 0, continuation from interiors") {
    val (words, vocab) = fixtureVocab()
    // every single character appears in both parts (the totality fallback)
    val chars = words.select(explode(Bpe.charSymbols(col("word"))).as("c"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(vocab.initial.toSet))
    assert(chars.subsetOf(vocab.continuation.toSet))
  }

  test("x230 fertility rows are comparable with the BPE family and sane") {
    val wp = SparkEntry.queries("x230_wordpiece_fertility")(spark, sf001)
    val bpe = SparkEntry.queries("x101_tokenizer_fertility")(spark, sf001)
    assert(wp.columns.toSeq == bpe.columns.toSeq,
      "the three families must report through one rollup shape")
    val rows = wp.collect()
    assert(rows.map(_.getAs[String]("lang")).sorted.toSeq ==
      bpe.collect().map(_.getAs[String]("lang")).sorted.toSeq)
    rows.foreach { r =>
      val fert = r.getAs[Long]("fertility_milli")
      // >= 1 piece per word; bounded by chars-per-word (char fallback)
      assert(fert >= 1000L, s"fertility below 1 in $r")
      assert(r.getAs[Long]("n_syms") <= r.getAs[Long]("n_chars") *
        r.getAs[Long]("n_words"), s"more pieces than characters in $r")
    }
  }
}
