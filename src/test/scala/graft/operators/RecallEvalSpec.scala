package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the recall-evaluation harness (x95): the self-recall
  * identity, hand-computed overlap counts, missing-query zeros, and the
  * registry entry's recall floor on the stored IVF tier.
  */
class RecallEvalSpec extends SparkSpec {

  test("recall counts are exact set-overlap per query, zero-filled for missed queries") {
    import spark.implicits._
    import graft.queries.Similarity
    val exact = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 7L), (2L, 8L), (2L, 9L))
      .toDF("q_id", "vec_id")
    val approx = Seq(
      (0L, 1L), (0L, 2L), (0L, 99L), // 2/3
      (1L, 4L), (1L, 5L), (1L, 6L)) // 3/3; query 2 absent entirely
      .toDF("q_id", "vec_id")
    val r = Similarity.recallAtK(approx, exact, k = 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(0L -> ((2L, 3L)), 1L -> ((3L, 3L)), 2L -> ((0L, 3L))),
      s"exact overlap accounting: $r")
  }

  test("self-recall is k/k for every query") {
    import spark.implicits._
    import graft.queries.Similarity
    val exact = (0L until 4L).flatMap(q => (0L until 5L).map(i => (q, q * 10 + i)))
      .toDF("q_id", "vec_id")
    val r = Similarity.recallAtK(exact, exact, k = 5).collect()
    assert(r.length == 4 && r.forall(x => x.getLong(1) == 5L),
      "a result set scored against itself recalls everything")
  }

  test("x95 registry entry: stored-IVF recall@10 monitored per query on the fixture") {
    val got = graft.SparkEntry.queries("x95_ann_recall_eval")(spark, sf001).collect()
    assert(got.map(_.getLong(0)).toSet == (0L until 8L).toSet,
      "one recall row per batch query")
    // the monitor reports truth, the gate encodes the serving SLO: no
    // query below 6/10 at nprobe = 6, batch mean >= 0.8 (the repo's
    // probe conventions; fixture measures one query at 7/10)
    got.foreach { r =>
      assert(r.getLong(2) == 10L)
      assert(r.getLong(1) >= 6L,
        s"query ${r.getLong(0)}: recall ${r.getLong(1)}/10 below the per-query SLO")
    }
    val mean = got.map(_.getLong(1)).sum / (10.0 * got.length)
    assert(mean >= 0.8, s"batch mean recall $mean below the SLO")
    val again = graft.SparkEntry.queries("x95_ann_recall_eval")(spark, sf001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
