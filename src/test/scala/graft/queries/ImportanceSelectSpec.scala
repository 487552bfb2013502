package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for DSIR-style importance selection (x89): the integer affinity
  * ratio test must keep planted target-echoing raw docs, reject docs
  * with no target overlap, and handle degenerate (bigram-free) docs.
  */
class ImportanceSelectSpec extends SparkSpec {

  test("planted target-echoing doc is selected; disjoint and bigram-free docs are not") {
    import spark.implicits._
    val d = Seq(
      (0L, "alpha beta gamma delta", "t"),
      (1L, "alpha beta gamma epsilon", "t"),
      (10L, "alpha beta gamma zeta", "raw"),
      (11L, "red green blue yellow", "raw"),
      (12L, "red green blue orange", "raw"),
      (13L, "loner", "raw"))
      .toDF("doc_id", "text", "source")
    val r = Text.importanceSelect(d, col("source") === "t").collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))).toMap

    assert(r.keySet == Set(10L, 11L, 12L, 13L),
      "only raw docs are scored; target docs leave the output")
    // model: "alpha beta" ct=2, "beta gamma" ct=2, "gamma delta" ct=1,
    // "gamma epsilon" ct=1; total_t=6, total_r=9
    assert(r(10L) == ((3L, 4L, 3L, true)),
      "echoing two target bigrams: 4*9 > 3*6, selected")
    assert(r(11L) == ((3L, 0L, 5L, false)), "zero target affinity, rejected")
    assert(r(12L) == ((3L, 0L, 5L, false)))
    assert(r(13L) == ((0L, 0L, 0L, false)),
      "a bigram-free doc scores zero and is rejected, not dropped")
  }

  test("x89 registry entry scores every non-target doc, deterministically") {
    val got = graft.SparkEntry.queries("x89_importance_select")(spark, sf001).collect()
    val nRaw = graft.Tables(spark, sf001, "documents")
      .where(col("source") =!= "src0").count()
    assert(got.length == nRaw, s"one row per raw doc: ${got.length} vs $nRaw")
    assert(got.exists(_.getBoolean(4)) && !got.forall(_.getBoolean(4)),
      "selection must be non-degenerate on the fixture corpus")
    val again = graft.SparkEntry.queries("x89_importance_select")(spark, sf001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
