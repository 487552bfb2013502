package graft.queries

import graft.SparkSpec

/** Exact substring-span detection on planted corpora: the k-gram coverage
  * sweep must find precisely the duplicated regions — cross-document
  * shares, within-document repeats — and nothing in clean text.
  */
class SubstringDedupSpec extends SparkSpec {

  test("planted duplicated substrings: cross-doc span, within-doc repeat, clean doc") {
    import spark.implicits._
    val d = Seq(
      (0L, "qqqq" + "abcdefghi" + "rrrr"),
      (1L, "ssss" + "abcdefghi" + "tttt"),
      (2L, "uniquetextwithnothingrepeated"),
      (3L, "mnopq" + "12345678" + "mnopq" + "87654321"),
      (4L, "tiny")) // shorter than k: no grams at all
      .toDF("doc_id", "text")
    val r = CorpusOps.substringSpans(d, k = 5).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    // the shared 9-char region yields covered positions 4..8 -> ONE island
    // whose interval union is exactly the 9 shared characters
    assert(r(0L) == ((1L, 9L, 9L)), "cross-doc 9-char share = one 9-char span")
    assert(r(1L) == ((1L, 9L, 9L)), "both sides of the share are reported")
    assert(r(2L) == ((0L, 0L, 0L)), "clean doc reports zeros")
    // "mnopq" at positions 0 and 13: a within-doc repeat covers BOTH
    // occurrences, and the 13-char gap (> k) keeps them separate islands
    assert(r(3L) == ((2L, 10L, 5L)), "within-doc repeat: two 5-char spans")
    assert(r(4L) == ((0L, 0L, 0L)), "sub-k doc has no windows and no spans")
    assert(r.size == 5, "every input document appears in the report")
  }

  test("hashed-fingerprint sweep is row-identical to the exact form and shuffles no strings") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    val planted = Seq(
      (0L, "qqqq" + "abcdefghi" + "rrrr"),
      (1L, "ssss" + "abcdefghi" + "tttt"),
      (2L, "uniquetextwithnothingrepeated"),
      (3L, "mnopq" + "12345678" + "mnopq" + "87654321"),
      (4L, "tiny")).toDF("doc_id", "text")
    val corpora = Seq(planted, graft.Tables(spark, sf001, "documents"))
    for (d <- corpora) {
      val exact = CorpusOps.substringSpans(d, k = 5).collect().map(_.toSeq).toSeq
      val hashed = CorpusOps.substringSpansHashed(d, k = 5)
      assert(hashed.collect().map(_.toSeq).toSeq == exact,
        "fingerprint coverage must reproduce the exact span report")
      // the scale claim: every wide exchange carries fixed-width columns
      // only — the k-char gram never leaves its narrow projection
      val exchanges = graft.SparkSpec
        .allPlanNodes(hashed.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty, "the sweep has wide stages to check")
      exchanges.foreach { e =>
        assert(!e.output.exists(_.dataType == StringType),
          s"a shuffle carries a string column: ${e.output.map(_.name)}")
      }
    }
  }

  test("incremental: batch spans score against the stored standing grams only") {
    import spark.implicits._
    val standing = Seq((10L, "qqqq" + "abcdefghi" + "rrrr")).toDF("doc_id", "text")
    val batch = Seq(
      (0L, "ssss" + "abcdefghi" + "tttt"), // shares 9 chars with standing
      (1L, "mnopq" + "12345678" + "mnopq"), // batch-INTERNAL repeat only
      (2L, "wholly novel content")).toDF("doc_id", "text")
    val store = java.nio.file.Files.createTempDirectory("graft-grams").toString
    CorpusOps.writeGramIndex(standing, k = 5, store)
    val r = CorpusOps.substringSpansAgainst(batch, k = 5, spark, store)
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r(0L) == ((1L, 9L, 9L)), "standing overlap is found from the stored index")
    assert(r(1L) == ((0L, 0L, 0L)),
      "a batch-internal repeat is NOT standing duplication — the incremental " +
        "question is 'already in my corpus?', and this text is not")
    assert(r(2L) == ((0L, 0L, 0L)))
  }

  test("substringClean cuts every duplicated span and fingerprints the remainder") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d = Seq(
      (0L, "qqqq" + "abcdefghi" + "rrrr"),
      (1L, "ssss" + "abcdefghi" + "tttt"),
      (2L, "uniquetextwithnothingrepeated"),
      (3L, "mnopq" + "12345678" + "mnopq" + "87654321"))
      .toDF("doc_id", "text")
    val r = CorpusOps.substringClean(d, k = 5).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4)))).toMap
    assert(r(0L) == ((17L, 8L, 1L, md5hex("qqqqrrrr"))),
      "the shared 9 chars vanish, prefix and suffix survive in order")
    assert(r(1L) == ((17L, 8L, 1L, md5hex("sssstttt"))))
    assert(r(2L) == ((29L, 29L, 0L, md5hex("uniquetextwithnothingrepeated"))),
      "clean docs pass through untouched")
    assert(r(3L) == ((26L, 16L, 2L, md5hex("1234567887654321"))),
      "BOTH copies of a within-doc repeat are cut (the Lee et al. semantics)")
  }

  test("overlapping duplicated windows merge into one maximal span") {
    import spark.implicits._
    // 12-char share: covered positions 0..7 (k=5), all gaps 1 -> one island
    // covering max-min+k = 12 chars
    val d = Seq(
      (0L, "abcdefghijkl" + "0000"),
      (1L, "abcdefghijkl" + "1111")).toDF("doc_id", "text")
    val r = CorpusOps.substringSpans(d, k = 5).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r(0L) == ((1L, 12L, 12L)))
    assert(r(1L) == ((1L, 12L, 12L)))
  }
}
