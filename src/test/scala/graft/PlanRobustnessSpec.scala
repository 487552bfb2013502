package graft

import org.apache.spark.sql.DataFrame

/** Physical-strategy invariance: results must not depend on which plan
  * Catalyst picks. Representative join/agg/window/kernel queries are re-run
  * with broadcast joins disabled and with AQE disabled, and must produce
  * row-identical results — the gate that separates "right answer because
  * the planner happened to broadcast" from "right answer, period". At
  * 100 TB these knobs WILL flip (per-stage sizes cross thresholds, AQE
  * re-plans mid-query), so semantics anchored to a physical choice are
  * latent wrong answers.
  */
class PlanRobustnessSpec extends SparkSpec {

  // heavier shapes across the operator families: star join, group-join,
  // decorrelated subquery, funnel windows, merge upsert, contamination
  // hash join, BM25 pivot, grouped-topk custom operator
  private val names = Seq(
    "b07_multijoin_revenue", "q18_large_orders", "b05b_decorrelated_join",
    "x49_funnel", "x43_merge_upsert", "x24_decontaminate",
    "x46_bm25_rank", "x27_knn_join")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  for (name <- names) {
    test(s"$name: identical results with broadcast joins and AQE disabled") {
      val baseline = rows(SparkEntry.queries(name)(spark, sf001))
      withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val hostile = rows(SparkEntry.queries(name)(spark, sf001))
        assert(hostile == baseline,
          s"$name diverged under no-broadcast/no-AQE planning: " +
            s"${hostile.size} vs ${baseline.size} rows")
      }
    }
  }
}
