package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join reduction (Spark's InjectRuntimeFilter): a
  * selective dim-side predicate materializes a bloom filter that prunes
  * the fact side BEFORE its shuffle — the engine-native semi-join
  * reduction that, at 100 TB, keeps a fact⋈filtered-dim join from
  * shuffling fact rows that cannot match. The production thresholds
  * (application side > 10 GB by stats) are sized for clusters, so the
  * spec lowers them to prove the mechanism and pins result invariance
  * with the feature off — the x190/x197 discipline: optimizations must
  * never change answers.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def factJoin(): DataFrame = {
    val li = Tables(spark, sf001, "lineitem")
    // no broadcast: force a shuffle join so the runtime filter has a
    // shuffle to save; the dim filter is selective (1 of 5 priorities)
    val o = Tables(spark, sf001, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .hint("merge")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("qty"))
  }

  test("selective dim filter injects a bloom filter on the fact side; results invariant") {
    val baseline = factJoin().collect().map(_.toString).sorted.toSeq
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = factJoin()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter on the fact side:\n$optimized")
      val filtered = df.collect().map(_.toString).sorted.toSeq
      assert(filtered == baseline,
        "runtime filtering must not change results")
    }
    withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      val off = factJoin().queryExecution.optimizedPlan.toString
      assert(!off.contains("might_contain"),
        "feature off must plan without the filter (the control arm)")
    }
  }
}
