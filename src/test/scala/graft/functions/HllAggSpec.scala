package graft.functions

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Gates for the native HLL aggregate: exact agreement with x152's
  * oracle-verified relational construction, bit-determinism under
  * arbitrary partitioning (the bytewise-max merge is commutative and
  * associative), SQL-surface parity, and the documented error regime.
  */
class HllAggSpec extends SparkSpec {

  private lazy val events = Tables(spark, sf001, "events")

  test("aggregate ≡ x152 relational pipeline, estimate for estimate") {
    val viaAgg = events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(HllAggregate.hllDistinct(col("user_id")).as("agg_est"))
    val viaRel = SparkEntry.queries("x152_hll_distinct")(spark, sf001)
      .where(col("day").isNotNull)
      .select(col("day"), col("est_n"))
    val joined = viaAgg.join(viaRel, "day")
      .select(col("agg_est"), col("est_n")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"aggregate ${r.getLong(0)} != relational ${r.getLong(1)}"))

    val globalAgg = events
      .agg(HllAggregate.hllDistinct(col("user_id"))).head().getLong(0)
    val globalRel = SparkEntry.queries("x152_hll_distinct")(spark, sf001)
      .where(col("day").isNull).head().getAs[Long]("est_n")
    assert(globalAgg == globalRel)
  }

  test("bit-identical under any partitioning (order-free merge)") {
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(HllAggregate.hllDistinct(col("user_id"))).head().getLong(0)
    val a = est(events.repartition(1))
    val b = est(events.repartition(17, col("event_type")))
    val c = est(events.repartition(32))
    assert(a == b && b == c, s"merge order leaked into the estimate: $a $b $c")
  }

  test("sql surface resolves to the same aggregate") {
    SqlFunctions.register(spark)
    events.createOrReplaceTempView("hll_events")
    val sql = spark.sql(
      "SELECT hll_distinct(user_id) AS e FROM hll_events").head().getLong(0)
    val api = events.agg(HllAggregate.hllDistinct(col("user_id"))).head().getLong(0)
    assert(sql == api)
  }

  test("estimates land in the documented error regime; empty input is 0") {
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    val est = events.agg(HllAggregate.hllDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.15,
      s"est $est vs exact $exact")
    val empty = events.where(lit(false))
      .agg(HllAggregate.hllDistinct(col("user_id"))).head().getLong(0)
    assert(empty == 0L)
    // nulls are ignored, not counted
    val withNulls = events.select(
      when(col("user_id") % 2 === 0, col("user_id")).as("user_id"))
    val estNn = withNulls.agg(HllAggregate.hllDistinct(col("user_id"))).head().getLong(0)
    val exactNn = withNulls.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(estNn - exactNn).toDouble / math.max(exactNn, 1) < 0.2)
  }
}
