package graft.queries

import graft.SparkSpec
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
}
