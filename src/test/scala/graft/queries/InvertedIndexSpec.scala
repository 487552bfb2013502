package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Gates for the x30 segmented inverted index: every aggregation buffer is
  * bounded by the segment width even on a worst-case stopword (df = corpus
  * size), and concatenating a token's segments in order reconstructs the
  * flat posting list exactly.
  */
class InvertedIndexSpec extends SparkSpec {

  // worst case for the flat layout: 'the' appears in EVERY document, so a
  // per-token collect_list would buffer the whole corpus for that token
  private lazy val stopwordHeavy = {
    import spark.implicits._
    (0L until 200L)
      .map(i => (i, s"the stop word test doc$i v${i % 5}", "en"))
      .toDF("doc_id", "text", "lang")
  }

  test("segment buffers are bounded by segWidth even for a df=N stopword") {
    val segWidth = 8L
    val idx = Text.invertedIndex(stopwordHeavy, segWidth, minDf = 1L).collect()
    val maxSeg = idx.map(_.getAs[Long]("seg_df")).max
    assert(maxSeg <= segWidth,
      s"a segment buffered $maxSeg ids > segWidth $segWidth")
    // the stopword really has full df and really is segmented
    val the = idx.filter(_.getString(0) == "the")
    assert(the.head.getAs[Long]("df") == 200L, "stopword df must be the corpus size")
    assert(the.length == 200 / segWidth,
      s"expected ${200 / segWidth} segments for the stopword, got ${the.length}")
  }

  test("concatenating a token's segments in seg order reconstructs the flat posting list") {
    val d = Tables(spark, sf001, "documents")
    val flat = d
      .select(explode(array_distinct(split(col("text"), " "))).as("token"), col("doc_id"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",", sort_array(collect_list(col("doc_id")))).as("postings"))
      .where(col("df") >= 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val segmented = Text.invertedIndex(d, segWidth = 64L, minDf = 5L)
      .orderBy("token", "seg").collect()
      .groupBy(_.getString(0))
      .map { case (tok, rows) =>
        tok -> ((rows.head.getAs[Long]("df"),
          rows.sortBy(_.getAs[Long]("seg")).map(_.getAs[String]("postings")).mkString(",")))
      }
    assert(segmented == flat,
      "segments must partition the flat posting list in doc_id order")
  }
}
