package graft.observe

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The engine's query-telemetry loop: every executed action must surface
  * duration + row/shuffle metrics from the finalized physical plan, the way
  * the reference's pipeline surfaces run metrics to Grafana.
  */
class MetricsListenerSpec extends SparkSpec {

  test("listener captures duration, scan rows, and shuffle volume per action") {
    val l = MetricsListener.install(spark)
    try {
      val expected = Tables(spark, sf001, "orders").count()
      // an aggregation with a shuffle
      Tables(spark, sf001, "orders")
        .groupBy("o_orderstatus").agg(count(lit(1))).collect()
      // listener events are delivered asynchronously post-action
      var tries = 0
      while (l.metrics.size < 2 && tries < 50) { Thread.sleep(100); tries += 1 }

      val ms = l.metrics
      assert(ms.size >= 2, s"both actions captured: $ms")
      assert(ms.forall(!_.failed))
      assert(ms.forall(_.durationMs >= 0))
      val agg = ms.last
      assert(agg.scanRows == expected, s"scan rows must count the orders scan: $agg")
      assert(agg.shuffleBytes > 0, s"groupBy must register shuffle volume: $agg")
      assert(agg.outputRows < agg.scanRows,
        s"outputRows must be the action's rows (3 status groups), not the scan's: $agg")

      // telemetry is itself queryable — the RunAnalytics pattern
      val df = l.toDF(spark)
      assert(df.where(col("shuffleBytes") > 0).count() >= 1)

      // drain hands off and empties the buffer (the count above may add one
      // more event, delivered asynchronously — so >=, not ==)
      assert(l.drain().size >= ms.size)
    } finally spark.listenerManager.unregister(l)
  }
}
