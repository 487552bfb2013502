package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Degenerate-corpus gates: single-token, sub-4-byte, and empty documents
  * must not crash the text/multimodal operators, and the Spark results must
  * keep the oracle-aligned semantics (the generated fixtures never hit these
  * shapes — min 10 tokens / 44 bytes — but a real corpus does).
  */
class EdgeCorpusSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("edge-corpus").toString
    Seq(
      (0L, "solo", "en", "src0", 4L),
      (1L, "ab", "en", "src0", 2L),
      (2L, "", "en", "src0", 0L),
      (3L, "the the the the", "en", "src0", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("x23 handles single-token and empty docs (dup_bigram_frac = 0, no crash)") {
    val rows = SparkEntry.queries("x23_repetition_filter")(spark, dir).collect()
    assert(rows.length == 4)
    val m = rows.map(r =>
      r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // single token (and empty text, which splits to [""]): no bigrams => 0.0
    assert(m(0L) == ((1.0, 0.0, false)))
    assert(m(2L) == ((1.0, 0.0, false)))
    // 'the the the the': top fraction 1, bigram dup 1 - 1/3
    assert(m(3L)._1 == 1.0 && math.abs(m(3L)._2 - (1.0 - 1.0 / 3)) < 1e-12 && !m(3L)._3)
  }

  test("x28 emits min(4, n_bytes) frames and skips empty payloads") {
    val rows = SparkEntry.queries("x28_frame_sample")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(!rows.exists(_._1 == 2L), "empty payload must produce no frames")
    assert(rows.count(_._1 == 0L) == 4 && rows.filter(_._1 == 0L).forall(_._4 == 1L))
    assert(rows.count(_._1 == 1L) == 2 && rows.filter(_._1 == 1L).forall(r => r._3 == 2L && r._4 == 1L))
    assert(rows.filter(_._1 == 3L).map(_._4).sorted.toSeq == Seq(3L, 4L, 4L, 4L))
  }

  test("x24 and x25 run without error on the degenerate corpus") {
    assert(SparkEntry.queries("x25_chunk_documents")(spark, dir).count() == 4)
    // all 4 docs fall in the benchmark range (doc_id < 50): corpus side empty
    assert(SparkEntry.queries("x24_decontaminate")(spark, dir).count() == 0)
  }

  test("retrieval/corpus-prep operators handle the degenerate corpus") {
    // no 8-token window repeats across these docs: sub-8-token docs hash as
    // whole-sequence shingles, all distinct
    assert(SparkEntry.queries("x41_passage_dedup")(spark, dir).count() == 0)
    // every doc yields at least one scored term (the empty doc tokenizes
    // to [""], which is still a term)
    assert(SparkEntry.queries("x45_tfidf_topterms")(spark, dir).count() >= 4)
    // none of the BM25 query terms occur => empty ranking, no crash
    assert(SparkEntry.queries("x46_bm25_rank")(spark, dir).count() == 0)
    // max bigram count is 3 ("the the" x3), below the >= 10 floor
    assert(SparkEntry.queries("x47_bigram_lm")(spark, dir).count() == 0)
    // deterministic sampling: recompute the md5 coin independently and
    // assert the EXACT keep set (all docs are 'en' => bound "33")
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = (0L to 3L).filter { id =>
      val hex = md.digest(s"$id:en".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(2)
      hex <= "33"
    }.toSet
    val kept = SparkEntry.queries("x42_hash_sample")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(kept == expected, s"kept $kept, expected $expected")
  }

  test("round-4 operators handle the degenerate corpus") {
    // x33: every doc (incl. empty text, which tokenizes to [""] = 1 token)
    // gets a bin; 4 tiny docs all fit in bin 0
    val packed = SparkEntry.queries("x33_sequence_packing")(spark, dir).collect()
    assert(packed.length == 4 && packed.forall(_.getLong(3) == 0L))
    // x30 at the registry's df >= 5 floor: max df here is 4 => empty, no crash
    assert(SparkEntry.queries("x30_inverted_index")(spark, dir).count() == 0)
    // ...and with the floor at 1, 'the' (docs 0-3? only doc 3) segments sanely
    val idx = Text.invertedIndex(
      graft.Tables(spark, dir, "documents"), segWidth = 8L, minDf = 1L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("df")).toMap
    assert(idx("the") == 1L, "array_distinct => one posting per doc, df counts docs")
    // x56: the empty-text doc contributes no >= 1-char words and drops out;
    // the other three segment without error
    val bpe = SparkEntry.queries("x56_bpe_vocab")(spark, dir).collect()
    assert(bpe.map(_.getLong(0)).toSet == Set(0L, 1L, 3L))
    // 'the the the the': 4 words x 3 chars; BPE merges can only shrink
    val d3 = bpe.find(_.getLong(0) == 3L).get
    assert(d3.getLong(2) == 12L && d3.getLong(3) <= 12L)
  }
}
