package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Gates for the curation quota ops: the token-budget source cap (x93)
  * and the exact stratified split (x94).
  */
class CurationSpec extends SparkSpec {

  test("source token cap keeps priority docs under budget, always at least one per source") {
    import spark.implicits._
    val d = Seq(
      // source a: docs of 10, 8, 5 tokens; budget 15 keeps 10 then 8
      // (cum-before 10 < 15) but not 5 (cum-before 18)
      (1L, "a", Seq.fill(10)("w").mkString(" ")),
      (2L, "a", Seq.fill(8)("w").mkString(" ")),
      (3L, "a", Seq.fill(5)("w").mkString(" ")),
      // source b: one giant 40-token doc — kept despite exceeding budget
      (4L, "b", Seq.fill(40)("w").mkString(" ")),
      (5L, "b", Seq.fill(6)("w").mkString(" ")))
      .map { case (id, src, text) => (id, text, src) }
      .toDF("doc_id", "text", "source")
    val r = CorpusOps.sourceTokenCap(d, budget = 15L).collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r.keySet == Set(1L, 2L, 4L),
      s"budget 15: a keeps 10+8, b keeps only its giant head doc: ${r.keySet}")
    assert(r(1L) == (("a", 10L, 10L)) && r(2L) == (("a", 8L, 18L)))
    assert(r(4L) == (("b", 40L, 40L)),
      "the first doc of a source is kept even when it alone exceeds the budget")
  }

  test("stratified split holds exact per-source quotas and is deterministic") {
    val d = graft.Tables(spark, sf001, "documents")
    val r = CorpusOps.stratifiedSplit(d)
    val bySrc = r.groupBy("source").pivot("split").count().collect()
      .map(x => x.getString(0) ->
        ((Option(x.get(1)).fold(0L)(_.asInstanceOf[Long]),
          Option(x.get(2)).fold(0L)(_.asInstanceOf[Long]),
          Option(x.get(3)).fold(0L)(_.asInstanceOf[Long]))))
      .toMap
    val counts = d.groupBy("source").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    for ((src, n) <- counts) {
      val (test, train, valN) = bySrc(src) // pivot orders columns test,train,val... verify below
      val total = test + train + valN
      assert(total == n, s"$src: split must cover all $n docs, got $total")
    }
    // exact quotas: train = ceil(0.8n), val = ceil(0.9n) - ceil(0.8n)
    val trains = r.where(col("split") === "train").groupBy("source").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    for ((src, n) <- counts) {
      val expected = (n * 4 + 4) / 5
      assert(trains(src) == expected,
        s"$src: train quota must be ceil(0.8*$n) = $expected, got ${trains(src)}")
    }
    val a = r.collect().map(_.toSeq).toSeq
    val b = CorpusOps.stratifiedSplit(d).collect().map(_.toSeq).toSeq
    assert(a == b, "the split is a pure function of doc_id")
  }

  test("epoch upsample realizes exact integer epochs and coin-bounded fractional ones") {
    import spark.implicits._
    val d = Seq(
      (1L, "ten words of text", "a"), (2L, "more text here", "a"),
      (3L, "other source text", "b"), (4L, "and another doc", "b"))
      .toDF("doc_id", "text", "source")
    // a: exactly 2 epochs (frac 0); b: 1 + 255/256 epochs (almost surely 2)
    val cfg = Seq(("a", 2, 0), ("b", 1, 255)).toDF("source", "base", "frac256")
    val r = CorpusOps.epochUpsample(d, cfg, "t").collect()
    val byDoc = r.groupBy(_.getLong(0)).view.mapValues { rows =>
      val reps = rows.map(_.getLong(3)).sorted.toSeq
      val n = rows.head.getLong(2)
      (n, reps)
    }.toMap
    for ((id, (n, reps)) <- byDoc)
      assert(reps == (0L until n), s"doc $id: reps must be 0..${n - 1}: $reps")
    assert(byDoc(1L)._1 == 2L && byDoc(2L)._1 == 2L,
      "frac256 = 0 means exactly base copies — no coin involved")
    assert(byDoc(3L)._1 >= 1L && byDoc(3L)._1 <= 2L)
    // deterministic: the realized multiset is a pure function of (doc_id, seed)
    val again = CorpusOps.epochUpsample(d, cfg, "t").collect().map(_.toSeq).toSeq
    assert(r.map(_.toSeq).toSeq == again)
  }

  test("quality calibration picks the exact rank-based threshold") {
    import spark.implicits._
    // one language, 5 docs with distinct diversity scores; keep 3/5 → the
    // threshold is the 3rd-highest score
    def textOf(distinct: Int): String =
      ((0 until distinct).map(i => s"w$i") ++ Seq.fill(10 - distinct)("w0"))
        .mkString(" ")
    val d = (1 to 5).map(i => (i.toLong, textOf(2 * i), "en"))
      .toDF("doc_id", "text", "lang")
    val r = CorpusOps.calibrateQuality(d, 3, 5).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "en")
    assert(row.getLong(1) == 5L, "n_docs")
    assert(row.getLong(2) == 3L, "keep 3/5 of 5 docs = ceil(3) = 3")
    // scores are 1000*distinct/10: docs have 2,4,6,8,10 distinct tokens →
    // 200,400,600,800,1000; top-3 = {1000,800,600} → threshold 600
    assert(row.getLong(3) == 600L, s"threshold: ${row.getLong(3)}")
    assert(row.getLong(4) == 2400L, "sum of kept scores 1000+800+600")
  }

  test("corpus health report: exact duplicate rate and means on a planted corpus") {
    import spark.implicits._
    // src a: 4 docs, one exact duplicate pair -> dup_rate 1000*(4-3)/4 = 250
    // src b: 2 identical docs -> dup_rate 500
    val d = Seq(
      (1L, "alpha beta gamma delta", "en", "a"),
      (2L, "alpha beta gamma delta", "en", "a"), // dup of 1
      (3L, "one two three four", "de", "a"),
      (4L, "five five five five", "en", "a"),
      (5L, "same text here", "en", "b"),
      (6L, "same text here", "fr", "b")) // dup of 5, different lang
      .toDF("doc_id", "text", "lang", "source")
    val r = CorpusOps.corpusHealth(d).collect()
      .map(x => x.getString(0) -> x.toSeq.drop(1)).toMap
    // a: 4 docs, 3 unique, 2 langs, 16 tokens; q scores: 1000,1000,1000,250
    //    -> mean (3250 div 4) = 812
    assert(r("a") == Seq(4L, 3L, 2L, 16L, 250L, 812L), s"src a: ${r("a")}")
    // b: 2 docs, 1 unique, 2 langs, 6 tokens; q 1000,1000 -> mean 1000
    assert(r("b") == Seq(2L, 1L, 2L, 6L, 500L, 1000L), s"src b: ${r("b")}")
  }

  test("curriculum order stages by global score rank without a global window") {
    import spark.implicits._
    // 16 docs, strictly increasing diversity → rank i is doc i; 8 stages
    // of exactly 2, pos 1..2 within each
    def textOf(distinct: Int): String =
      ((0 until distinct).map(i => s"w$i") ++ Seq.fill(16 - distinct)("w0"))
        .mkString(" ")
    val d = (1 to 16).map(i => (i.toLong, textOf(i))).toDF("doc_id", "text")
    val r = CorpusOps.curriculumOrder(d, stages = 8).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getLong(3)))).toMap
    for (i <- 1 to 16) {
      val expectedStage = ((i - 1) * 8) / 16
      val expectedPos = i.toLong - (expectedStage * 16 + 7) / 8
      assert(r(i.toLong) == ((expectedStage.toLong, expectedPos)),
        s"doc $i: expected stage $expectedStage pos $expectedPos, got ${r(i.toLong)}")
    }
    // fixture sanity on real data: stages partition the corpus, sizes differ ≤ 1
    val real = CorpusOps.curriculumOrder(
      graft.Tables(spark, sf001, "documents"), stages = 8)
    val sizes = real.groupBy("stage").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(sizes.keySet == (0L to 7L).toSet, s"all 8 stages present: $sizes")
    assert(sizes.values.max - sizes.values.min <= 1,
      s"stage sizes must be balanced: $sizes")
  }

  test("x191: folds deal by cluster - exact dups never straddle folds") {
    val rows = graft.SparkEntry.queries("x191_group_kfold")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._3 >= 0 && r._3 < 4))
    // every cluster lands in exactly one fold
    rows.groupBy(_._2).foreach { case (ck, xs) =>
      assert(xs.map(_._3).distinct.length == 1, s"cluster $ck straddles folds")
    }
    // the hash deal is roughly even (each fold within [15, 35] percent)
    val n = rows.length.toDouble
    val sizes = rows.groupBy(_._3).view.mapValues(_.length / n).toMap
    (0 until 4).foreach { f =>
      val p = sizes.getOrElse(f, 0.0)
      assert(p > 0.15 && p < 0.35, s"fold $f share $p")
    }
  }

  test("x202: budget is integer floor(total/2) and targets apportion exactly") {
    val rows = graft.SparkEntry.queries("x202_temperature_mix")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    val nTotal = graft.Tables(spark, sf001, "documents").count()
    // floor division, not round-half: an odd corpus count must budget
    // (n-1)/2 on BOTH engines (the cross-engine hash hazard the r8
    // ADVICE flagged)
    val budget = nTotal / 2
    val sumTarget = rows.map(_.getAs[Long]("target")).sum
    assert(sumTarget == budget, s"sum(target)=$sumTarget budget=$budget n=$nTotal")
  }

  test("x399 gini: rank-sum identity replays driver-side and bounds hold") {
    val got = SparkEntry.queries("x399_doc_length_gini")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars"),
          r.getAs[Long]("gini_milli"))).toMap
    val byLang = graft.Tables(spark, sf001, "documents")
      .selectExpr("lang", "n_chars", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(got.keySet == byLang.keySet)
    for ((lang, rows) <- byLang) {
      val xs = rows.sortBy(t => (t._2, t._3)).map(_._2)
      val n = xs.length.toLong
      val tot = xs.sum
      val wsum = xs.zipWithIndex.map { case (x, i) =>
        BigInt(i + 1) * BigInt(x) }.sum
      val gini = (BigInt(2000) * wsum / (BigInt(n) * BigInt(tot))
        - BigInt(1000L * (n + 1)) / BigInt(n)).toLong
      assert(got(lang) == ((n, tot, gini)), s"$lang: ${got(lang)}")
      // Gini of nonnegative data lies in [0, 1): milli form in [0, 1000)
      assert(gini >= 0L && gini < 1000L, s"$lang gini out of range: $gini")
    }
  }

  test("x403 histogram rank-walk == x399 per-document window, row for row") {
    // the 100 TB form must be bit-identical to the sort-window form: the
    // rank-sum of a tie run is c*C_prev + c(c+1)/2, permutation-invariant
    // within the run, so the histogram walk computes x399's exact wsum
    val key = (r: org.apache.spark.sql.Row) => r.getString(0)
    val a = SparkEntry.queries("x399_doc_length_gini")(spark, sf001)
      .collect().map(r => key(r) -> r.toSeq.tail).toMap
    val b = SparkEntry.queries("x403_length_gini_hist")(spark, sf001)
      .collect().map(r => key(r) -> r.toSeq.tail).toMap
    assert(a.nonEmpty && a == b,
      s"histogram walk diverged: ${(a.keySet ++ b.keySet).filter(k => a.get(k) != b.get(k))}")
  }

  test("x393 split balance: cells reconcile per language and the design shares are the hash-range ones") {
    val rows = SparkEntry.queries("x393_split_balance_audit")(spark, sf001)
      .collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, cells) =>
      val nLang = cells.head.getAs[Long]("n_lang")
      assert(cells.forall(_.getAs[Long]("n_lang") == nLang))
      assert(cells.map(_.getAs[Long]("n_docs")).sum == nLang,
        s"cells must partition language $lang")
      cells.foreach { r =>
        assert(r.getAs[Long]("share_milli") ==
          1000L * r.getAs[Long]("n_docs") / nLang)
        // 'cc'/'e6' two-hex thresholds carve 204/26/26 of 256
        val expect = r.getAs[String]("split") match {
          case "train" => 204L * 1000 / 256
          case _ => 26L * 1000 / 256
        }
        assert(r.getAs[Long]("expected_milli") == expect)
        assert(r.getAs[Long]("dev_milli") ==
          r.getAs[Long]("share_milli") - expect)
      }
    }
  }
}
