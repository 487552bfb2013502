package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Cost-based-optimizer integration: table statistics computed by ANALYZE
  * TABLE must actually steer physical planning — a small table with known
  * stats broadcasts WITHOUT an explicit broadcast() hint. This is the
  * catalog-driven half of the broadcast decision (the AQE runtime half is
  * covered by the b07/q18 plans).
  */
class CatalogStatsSpec extends SparkSpec {

  test("ANALYZE TABLE stats reach the optimizer and the join broadcasts") {
    val expectRows = Tables(spark, sf001, "nation").count()
    Tables(spark, sf001, "nation").write.mode("overwrite")
      .saveAsTable("graft_nation_stats")
    Tables(spark, sf001, "customer").createOrReplaceTempView("customer_v")
    val cboSaved = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true") // row counts propagate under CBO
    try {
      // before ANALYZE: only file-size fallback exists — no row count.
      // (sizeInBytes alone would already broadcast this tiny table, so the
      // row count is the signal that proves CATALOG stats are consulted.)
      def planRowCount(): Option[BigInt] =
        spark.table("graft_nation_stats").queryExecution
          .optimizedPlan.stats.rowCount
      assert(planRowCount().isEmpty,
        "no ANALYZE yet => the optimizer must not see a row count")

      spark.sql("ANALYZE TABLE graft_nation_stats COMPUTE STATISTICS")
      assert(planRowCount().contains(BigInt(expectRows)),
        s"ANALYZE row count must reach plan statistics: ${planRowCount()}")

      val joined = spark.table("graft_nation_stats")
        .join(spark.table("customer_v"),
          col("n_nationkey") === col("c_nationkey"))
      joined.collect()
      val plan = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(plan.contains("BroadcastHashJoin"),
        s"known-small table must broadcast with no hint:\n$plan")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cboSaved)
      spark.sql("DROP TABLE IF EXISTS graft_nation_stats")
    }
  }
}
