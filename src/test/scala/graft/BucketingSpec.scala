package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bucketed co-located join (prompt/§2.C: "bucketing for co-located joins"):
  * both sides bucketed on the join key join WITHOUT a shuffle exchange — the
  * strategy that turns the recurring big-big join at 100 TB from two full
  * shuffles into zero.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without shuffle") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse
    // (gitignored) and are dropped in the finally
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast

    try {
      Tables(spark, sf001, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables(spark, sf001, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), Seq("o_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString

      assert(plan.contains("SortMergeJoin"), plan)
      // bucketed sides satisfy the join's distribution: no shuffle before it
      val joinIdx = plan.indexOf("SortMergeJoin")
      val beforeJoin = plan.substring(joinIdx)
      assert(!beforeJoin.contains("Exchange hashpartitioning"),
        s"bucketed join must not reshuffle its inputs:\n$plan")

      // and the result matches the unbucketed join
      val expected = Tables(spark, sf001, "orders")
        .join(Tables(spark, sf001, "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"), Seq("o_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
