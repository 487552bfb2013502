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

  // ---- scale apply path: BpeApplyAll + vocab segmentation (round-5) ----

  /** A 1000-merge LEARNED-shape table: rank k merges (c_0…c_k, c_{k+1})
    * over a word of strictly ascending code points starting at 'a'. This is
    * exactly what [[Bpe.learn]] produces on the single long word — every
    * round's pairs all have count 1 and the prefix pair (starting with 'a',
    * the smallest symbol byte-wise) wins the code-point tie-break — so the
    * table respects the learned-table invariant (each component exists when
    * its rank fires) without running 1000 driver rounds; the first rounds
    * are cross-checked against the real trainer below.
    */
  private def chainChars(n: Int): Vector[String] =
    (0 to n).map(i => new String(Character.toChars('a' + i))).toVector

  private def chainMerges(n: Int): Seq[BpeMerge] = {
    val cs = chainChars(n)
    (0 until n).map(k => BpeMerge(k, cs.take(k + 1).mkString, cs(k + 1), 1L))
  }

  /** Words exercising partial/absent/full merge application against the
    * chain table: every prefix length, suffixes (no merge fires — each rank
    * needs the 'a'-rooted prefix), doubled chars, and shuffled windows.
    */
  private def chainCorpus(n: Int): Seq[String] = {
    val full = chainChars(n).mkString
    val rnd = new scala.util.Random(42)
    val prefixes = Seq(1, 2, 3, 7, n / 2, n, n + 1).map(full.take)
    val suffixes = Seq(2, 5, n / 3).map(full.takeRight)
    val shuffled = (0 until 10).map { _ =>
      val start = rnd.nextInt(n - 8)
      new String(rnd.shuffle(full.slice(start, start + 8).toSeq).toArray)
    }
    val doubled = Seq("aabbcc", full.take(4) * 3, "a" * 9)
    prefixes ++ suffixes ++ shuffled ++ doubled
  }

  test("BpeApplyAll reproduces the 200-merge literal fold row-for-row") {
    import spark.implicits._
    // 200 merges, NOT 1000: the FOLD side nests one UnaryExpression per
    // rank, and Catalyst's recursive analyzer overflows the thread stack
    // somewhere past ~500 levels — a 1000-deep fold cannot even be
    // ANALYZED on a default stack (which is precisely the kernel's reason
    // to exist). 200 ranks exercise the same cursor/rank logic while
    // staying comfortably analyzable; 1000-merge behavior is pinned
    // kernel-only below and in the bounded-plan test.
    val merges = chainMerges(200)
    // the chain table IS the learned table: cross-check the construction
    // against the real trainer on the first rounds
    val firstLearned = Bpe.learn(
      Seq(chainChars(200).mkString -> 1L).toDF("word", "n"), nMerges = 6)
    assert(firstLearned.map(m => (m.left, m.right)) ==
      chainMerges(6).map(m => (m.left, m.right)),
      "chain construction must match what learn() produces on the long word")

    val words = chainCorpus(200).toDF("word")
    val both = words.select(
      col("word"),
      Bpe.applyMerges(Bpe.charSymbols(col("word")), merges).as("fold"),
      Bpe.applyMergesAll(Bpe.charSymbols(col("word")), merges).as("all"))
      .collect()
    for (r <- both)
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"fold vs kernel diverged on word '${r.getString(0).take(40)}…'")
    // the kernel alone handles production depth: the fully-mergeable word
    // collapses to one symbol under the full 1000-merge table
    val fullWord = chainChars(1000).mkString
    val one = Seq(fullWord).toDF("word")
      .select(Bpe.applyMergesAll(Bpe.charSymbols(col("word")), chainMerges(1000)).as("s"))
      .head().getSeq[String](0)
    assert(one == Seq(fullWord), "1000 chained merges collapse the word to 1 symbol")
  }

  test("BpeApplyAll equals the fold on ARBITRARY tables (duplicates included)") {
    import spark.implicits._
    // the kernel's cursor argument claims exact fold equivalence for ANY
    // table, not just learned ones — fuzz it with random tables containing
    // duplicate pairs and merges that re-create earlier pairs' components
    val rnd = new scala.util.Random(7)
    val symbols = Vector("a", "b", "c", "ab", "bc", "ca", "abc")
    for (trial <- 0 until 8) {
      val table = (0 until 30).map { k =>
        BpeMerge(k, symbols(rnd.nextInt(symbols.length)),
          symbols(rnd.nextInt(symbols.length)), 1L)
      }
      val words = (0 until 40)
        .map(_ => (0 until (1 + rnd.nextInt(12))).map(_ => "abc" (rnd.nextInt(3))).mkString)
      val rows = words.toDF("word").select(
        Bpe.applyMerges(Bpe.charSymbols(col("word")), table).as("fold"),
        Bpe.applyMergesAll(Bpe.charSymbols(col("word")), table).as("all"))
        .collect()
      for (r <- rows)
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"trial $trial: fold vs kernel diverged; table=$table")
    }
  }

  test("the scale path's plan is bounded: no per-rank nodes at 1000 merges") {
    import spark.implicits._
    def planLines(n: Int): Int =
      Seq("abc").toDF("word")
        .select(Bpe.applyMergesAll(Bpe.charSymbols(col("word")), chainMerges(n)).as("s"))
        .queryExecution.analyzed.treeString.linesIterator.size
    assert(planLines(1000) == planLines(10),
      "plan tree must not grow with the merge count (one kernel node total)")
    val big = Seq("abc").toDF("word")
      .select(Bpe.applyMergesAll(Bpe.charSymbols(col("word")), chainMerges(1000)).as("s"))
      .queryExecution.analyzed.treeString
    assert(!big.contains("bpe_merge_step"), "no per-rank BpeMergeStep nodes")
  }

  test("x61 (vocab-segmentation apply) is row-identical to x56 (fold apply)") {
    // two physical paths, one result — the x46/x58 pattern, in-suite:
    // x56 folds per occurrence with zero joins; x61 segments the distinct
    // vocab once and joins back by word
    val a = graft.SparkEntry.queries("x56_bpe_vocab")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    val b = graft.SparkEntry.queries("x61_bpe_tokenize_scale")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b, s"x56 (${a.size} rows) and x61 (${b.size} rows) must agree")
    // plan pin: x61 applies the table through the single-node kernel and
    // zero per-rank steps. Checked by expression CLASS over the OPTIMIZED
    // plan, not by grepping executedPlan.toString — column pruning folds
    // the kernel into HashAggregate resultExpressions, which simpleString
    // does not render, so a text grep misses a kernel that IS there.
    import graft.functions.{BpeApplyAll, BpeMergeStep}
    val opt = graft.SparkEntry.queries("x61_bpe_tokenize_scale")(spark, sf001)
      .queryExecution.optimizedPlan
    val exprs = opt.collect { case p =>
      p.expressions.flatMap(_.collect { case e => e })
    }.flatten
    assert(exprs.exists(_.isInstanceOf[BpeApplyAll]),
      "x61 must apply the table through the single-node BpeApplyAll kernel")
    assert(!exprs.exists(_.isInstanceOf[BpeMergeStep]),
      "x61 must not fold per-rank BpeMergeStep kernels")
  }

  test("bpe_apply_all is SQL-callable; misuse fails analysis naming the argument") {
    graft.functions.SqlFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT bpe_apply_all(array('l','o','w','e','r'), array('l','o','lo'), array('o','w','w')) AS m")
      .head().getSeq[String](0)
    // rank 0 (l,o)→lo, rank 1 (o,w) no longer adjacent… then rank 2 (lo,w)? wait:
    // ['l','o','w','e','r'] → rank0 → ['lo','w','e','r'] → rank1 (o,w): absent
    // → rank2 (lo,w) → ['low','e','r']
    assert(viaSql == Seq("low", "e", "r"))
    // non-literal merge-table parameter: AnalysisException, not a raw
    // IllegalArgumentException at expression-build time (ADVICE r4). The
    // array must be built from a COLUMN REFERENCE (genuinely non-foldable)
    // with lefts/rights the same length — split('a b', ' ') is foldable and
    // would be accepted, leaving a length-mismatch error to pass this test
    // for the wrong reason (ADVICE r5).
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT bpe_apply_all(array('a'), array(w), array('b')) FROM VALUES ('x') AS t(w)")
        .collect()
    }
    assert(ex.getMessage.contains("bpe_apply_all") && ex.getMessage.contains("lefts"),
      s"must name kernel and argument: ${ex.getMessage}")
    // SQL's only empty-array spelling types as array<null>; it is accepted
    // as the EMPTY merge table (tokenize with zero merges = identity),
    // not rejected as a type error (ADVICE r5)
    val empty = spark.sql(
      "SELECT bpe_apply_all(array('l', 'o'), array(), array()) AS m")
      .head().getSeq[String](0)
    assert(empty == Seq("l", "o"), "empty merge table must be the identity")
  }

  // ---- id vocabulary + trainer-ready encoding (x69) ----

  test("idVocab numbers chars in code-point order then merges by rank; duplicate surfaces keep the smallest id") {
    // ranks 1 and 2 produce the SAME surface string "abc" from different
    // components — legal in a learned table, and the encode join must not
    // fan out on it
    val merges = Seq(BpeMerge(0, "a", "b", 1L), BpeMerge(1, "ab", "c", 1L),
      BpeMerge(2, "a", "bc", 1L))
    val vocab = Bpe.idVocab(Seq("b", "a", "c", "�"), merges).toMap
    assert(vocab("a") == 0 && vocab("b") == 1 && vocab("c") == 2,
      s"chars must number in code-point order: $vocab")
    assert(vocab("�") == 3, "multi-byte char sorts after ASCII by UTF-8 bytes")
    assert(vocab("ab") == 4, "first merge takes the next id")
    assert(vocab("abc") == 5,
      s"duplicate surface 'abc' (ranks 1 and 2) keeps the smallest id: $vocab")
  }

  test("encodeVocabIds round-trips through the vocabulary; unseen chars encode to -1") {
    import spark.implicits._
    val corpus = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L)
    val merges = Bpe.learn(corpus.toDF("word", "n"), nMerges = 4)
    val chars = corpus.map(_._1).flatMap(_.toCharArray.map(_.toString)).distinct
    val vocab = Bpe.idVocab(chars, merges)
    val idsDf = vocab.toDF("symbol", "id")
    val words = (corpus.map(_._1) :+ "lowxy").toDF("word") // x, y unseen
    val got = Bpe.encodeVocabIds(words, "word", merges, idsDf)
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toList).toMap
    val byId = vocab.map(_.swap).toMap
    val seg = words
      .select(col("word"), Bpe.applyMergesAll(Bpe.charSymbols(col("word")), merges).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    for (w <- corpus.map(_._1)) {
      assert(got(w).forall(_ >= 0), s"training-corpus word '$w' must have no OOV: ${got(w)}")
      assert(got(w).map(byId) == seg(w),
        s"'$w': decoding ids must reproduce the segmentation exactly")
    }
    // the word with unseen chars: known prefix encodes, x/y surface as -1
    val tail = got("lowxy").takeRight(2)
    assert(tail == List(-1, -1), s"unseen chars must encode to -1: ${got("lowxy")}")
    assert(got("lowxy").dropRight(2).forall(_ >= 0))
  }

  test("x69 ids reproduce x56's per-document symbol counts over the fixture") {
    // n_ids per doc must equal x56's n_bpe_syms (same segmentation, now as
    // ids), and the training corpus has zero OOV by construction
    val enc = graft.SparkEntry.queries("x69_bpe_encode_ids")(spark, sf001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ref = graft.SparkEntry.queries("x56_bpe_vocab")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(enc.keySet == ref.keySet, "one id row per document")
    for ((id, (nIds, nOov)) <- enc) {
      assert(nIds == ref(id), s"doc $id: n_ids $nIds != x56 n_bpe_syms ${ref(id)}")
      assert(nOov == 0L, s"doc $id: training corpus cannot have OOV, got $nOov")
    }
  }

  test("tokenizer fertility: hand-computed per-language ratios under a planted merge table") {
    import spark.implicits._
    // one merge (a,b) -> "ab": lang X words are built from it, lang Y's are
    // not, so X pays fewer symbols per word — the vocabulary-fit signal the
    // operator exists to surface
    val merges = Seq(BpeMerge(0, "a", "b", 4L))
    val d = Seq(
      (1L, "ab abab ab", "X"), // words: ab(1 sym), abab(2), ab(1)
      (2L, "cd cd", "Y"))      // words: cd(2), cd(2) — no merge applies
      .toDF("doc_id", "text", "lang")
    val r = graft.queries.Text.tokenizerFertility(d, merges)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    // X: 3 words, 4 syms, 8 chars -> fertility 1333, compression 500
    assert(r("X") == ((3L, 4L, 8L, 1333L, 500L)), s"lang X: ${r("X")}")
    // Y: 2 words, 4 syms, 4 chars -> fertility 2000, compression 1000
    assert(r("Y") == ((2L, 4L, 4L, 2000L, 1000L)), s"lang Y: ${r("Y")}")
    assert(r("X")._4 < r("Y")._4,
      "the language the vocabulary fits must pay fewer symbols per word")
  }

  test("x101 registry entry serves per-language fertility from the stored merge table") {
    val got = graft.SparkEntry.queries("x101_tokenizer_fertility")(spark, sf001)
      .collect()
    assert(got.nonEmpty, "one row per fixture language")
    for (r <- got) {
      // a word can never segment to fewer than one symbol, or more symbols
      // than characters
      assert(r.getLong(4) >= 1000L, s"${r.getString(0)}: fertility below 1 sym/word")
      assert(r.getLong(2) <= r.getLong(3),
        s"${r.getString(0)}: more symbols than characters")
    }
    val again = graft.SparkEntry.queries("x101_tokenizer_fertility")(spark, sf001)
      .collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "stored-vocab fertility must be deterministic across invocations")
  }
}
