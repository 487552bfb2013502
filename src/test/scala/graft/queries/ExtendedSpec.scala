package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ExtendedSpec extends SparkSpec {

  test("c30 approx percentiles track the exact answers within 5%") {
    val approx = SparkEntry.queries("c30_approx_percentiles")(spark, sf001)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = Tables(spark, sf001, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        expr("percentile(o_totalprice, 0.99)").as("p99"))
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(approx.keySet == exact.keySet)
    for (k <- exact.keys; i <- 0 until 3) {
      val (a, e) = (approx(k)(i), exact(k)(i))
      assert(math.abs(a - e) / e < 0.05, s"$k p${Seq(50, 90, 99)(i)}: approx $a vs exact $e")
    }
  }

  test("c21 approx distinct within 5% of exact") {
    val approx = SparkEntry.queries("c21_approx_distinct")(spark, sf001).head()
    val exact = Tables(spark, sf001, "lineitem")
      .agg(countDistinct(col("l_partkey")), countDistinct(col("l_suppkey"))).head()
    for (i <- 0 to 1) {
      val (a, e) = (approx.getLong(i).toDouble, exact.getLong(i).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"col $i: approx $a vs exact $e")
    }
  }

  test("c20 as-of join: asof_signup is the latest signup <= purchase ts") {
    val out = SparkEntry.queries("c20_asof_join")(spark, sf001).cache()
    // no asof value may postdate its purchase
    assert(out.where(col("asof_signup") > col("purchase_ts")).count() == 0)
    // spot-verify one user against a direct computation
    val e = Tables(spark, sf001, "events")
    val u = out.where(col("asof_signup").isNotNull).head().getAs[Long]("user_id")
    val signups = e.where(col("event_type") === "signup" && col("user_id") === u)
      .select(col("ts")).collect().map(_.getTimestamp(0)).sorted
    val pairs = out.where(col("user_id") === u)
      .select("purchase_ts", "asof_signup").collect()
    pairs.foreach { r =>
      val expected = signups.filter(!_.after(r.getTimestamp(0))).lastOption.orNull
      assert(r.getTimestamp(1) == expected, s"user $u purchase ${r.getTimestamp(0)}")
    }
  }
}
