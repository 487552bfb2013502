package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** PlanAudit: each rule must fire on a deliberately bad plan and stay
  * quiet on the healthy version of the same query — and the repo's own
  * flagship query must audit clean (the lint agreeing with the
  * hand-applied plan discipline it mechanizes).
  */
class PlanAuditSpec extends SparkSpec {

  test("cartesian: fires on a cross join, quiet on the equi-join") {
    val li = Tables(spark, sf001, "nation").select(col("n_nationkey"))
    val r = Tables(spark, sf001, "region").select(col("r_regionkey"))
    val bad = PlanAudit.audit(li.crossJoin(r))
    assert(bad.byRule("cartesian").nonEmpty, bad.findings.toString)
    val good = PlanAudit.audit(
      Tables(spark, sf001, "nation")
        .join(Tables(spark, sf001, "region"),
          col("n_regionkey") === col("r_regionkey")))
    assert(good.byRule("cartesian").isEmpty, good.findings.toString)
  }

  test("unpruned-scan: fires on select-star of a wide table, quiet when pruned") {
    // lineitem is the widest fixture table; star-scan it
    val wide = Tables(spark, sf001, "lineitem")
    assert(wide.schema.length >= PlanAudit.WideScanColumns,
      s"fixture lineitem width ${wide.schema.length}")
    val bad = PlanAudit.audit(wide.groupBy().agg(count(lit(1))).limit(1))
    // star scan: output == full schema
    val pruned = PlanAudit.audit(
      wide.select(col("l_orderkey"), col("l_quantity"))
        .groupBy().agg(sum(col("l_quantity"))))
    assert(pruned.byRule("unpruned-scan").isEmpty, pruned.findings.toString)
    // count(*) prunes to zero columns, so craft a real star consumer
    val star = PlanAudit.audit(wide.orderBy("l_orderkey"))
    assert(star.byRule("unpruned-scan").nonEmpty ||
      bad.byRule("unpruned-scan").nonEmpty,
      (star.findings ++ bad.findings).toString)
  }

  test("unpushed-filter: fires when the predicate can't reach parquet") {
    val docs = Tables(spark, sf001, "documents")
    // length() is not a pushable predicate -> PushedFilters: []
    val bad = PlanAudit.audit(
      docs.select(col("doc_id"), col("text"))
        .where(length(col("text")) % 7 === 3))
    assert(bad.byRule("unpushed-filter").nonEmpty, bad.findings.toString)
    // a plain range predicate pushes down -> quiet
    val good = PlanAudit.audit(
      docs.select(col("doc_id")).where(col("doc_id") > 10))
    assert(good.byRule("unpushed-filter").isEmpty, good.findings.toString)
  }

  test("single-partition-exchange: fires on a global window, quiet when keyed") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, sf001, "events").select(col("event_id"), col("user_id"))
    val bad = PlanAudit.audit(
      e.withColumn("rn", row_number().over(Window.orderBy("event_id"))))
    assert(bad.byRule("single-partition-exchange").nonEmpty,
      bad.findings.toString)
    val good = PlanAudit.audit(
      e.withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy("event_id"))))
    assert(good.byRule("single-partition-exchange").isEmpty,
      good.findings.toString)
  }

  test("the flagship entry query audits clean") {
    val report = PlanAudit.audit(graft.SparkEntry.entry(spark))
    assert(report.isClean, report.findings.toString)
  }

  test("x196: the bucketed band join audits clean (no cartesian anywhere)") {
    val df = graft.SparkEntry.queries("x196_band_join")(spark, sf001)
    val report = PlanAudit.audit(df)
    assert(report.byRule("cartesian").isEmpty, report.findings.toString)
    // the rewrite's work shows in the JOIN KEYS: candidates are
    // (day, bucket)-grained — the naive plan's equi side is day alone,
    // so its per-day candidate fan-out is |L_day| x |R_day| regardless
    // of which join strategy the planner picks at this fixture size
    val joined = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joined.nonEmpty)
    assert(joined.exists(_.leftKeys.exists(_.toString.contains("bucket"))),
      joined.map(_.simpleString(200)).mkString("\n"))
  }

  test("x197: the salted join's keys carry the salt") {
    val df = graft.SparkEntry.queries("x197_salted_join")(spark, sf001)
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.exists(_.leftKeys.exists(_.toString.contains("salt"))),
      joins.map(_.simpleString(200)).mkString("\n"))
    assert(df.collect().forall(_.getBoolean(3)),
      "the salted join must reproduce the joinless pair count")
  }

  test("pushed-filter tokenizer splits on top-level commas only") {
    // an IN predicate's internal commas must not fragment the entry
    assert(PlanAudit.splitTopLevel("IsNotNull(x), In(x, [1,2,3])") ==
      Seq("IsNotNull(x)", "In(x, [1,2,3])"))
    assert(PlanAudit.splitTopLevel("In(x, [1,2,3])") == Seq("In(x, [1,2,3])"))
    assert(PlanAudit.splitTopLevel("") == Seq.empty)
    assert(PlanAudit.splitTopLevel("IsNotNull(a), IsNotNull(b)") ==
      Seq("IsNotNull(a)", "IsNotNull(b)"))
  }
}
