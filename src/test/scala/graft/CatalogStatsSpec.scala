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

  test("ANALYZE TABLE stats drive the broadcast decision without hints") {
    Tables(spark, sf001, "nation").write.mode("overwrite")
      .saveAsTable("graft_nation_stats")
    Tables(spark, sf001, "customer").createOrReplaceTempView("customer_v")
    try {
      spark.sql("ANALYZE TABLE graft_nation_stats COMPUTE STATISTICS")
      val stats = spark.sql("DESCRIBE EXTENDED graft_nation_stats")
        .where(col("col_name") === "Statistics").collect()
      assert(stats.nonEmpty && stats.head.getString(1).contains("bytes"),
        s"ANALYZE must record table size: ${stats.toSeq}")

      val joined = spark.table("graft_nation_stats")
        .join(spark.table("customer_v"),
          col("n_nationkey") === col("c_nationkey"))
      joined.collect()
      val plan = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(plan.contains("BroadcastHashJoin"),
        s"known-small table must broadcast on stats alone:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS graft_nation_stats")
  }
}
