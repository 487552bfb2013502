package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom grouped-top-k operator: exact agreement with the window
  * formulation on a total order, plus the property that justifies its
  * existence — the partial pass bounds what reaches the exchange.
  */
class GroupedTopKSpec extends SparkSpec {

  private def installed[T](body: => T): T = {
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ GroupedTopKStrategy
    try body
    finally spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == GroupedTopKStrategy)
  }

  test("groupedTopK == window row_number form on a total order") {
    installed {
      val orders = Tables(spark, sf001, "orders")
      val topk = GroupedTopKOps.groupedTopK(
        orders,
        keyCols = Seq(col("o_custkey")),
        orderCols = Seq(col("o_orderdate").desc, col("o_orderkey").desc),
        k = 3)
      val viaCustom = topk
        .select("o_custkey", "o_orderkey")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val viaWindow = orders
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("o_custkey", "o_orderkey")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      assert(viaCustom == viaWindow,
        s"custom=${viaCustom.size} window=${viaWindow.size}; " +
          s"diff=${(viaCustom diff viaWindow) ++ (viaWindow diff viaCustom)}")
    }
  }

  test("empty keys = GLOBAL top-k, not per-partition locals") {
    installed {
      val df = spark.range(0, 10000, 1, 8).select(col("id").as("v"))
      val global = GroupedTopKOps.groupedTopK(df, Seq.empty, Seq(col("v").desc), 5)
        .collect().map(_.getLong(0)).toSet
      assert(global == Set(9999L, 9998L, 9997L, 9996L, 9995L),
        s"must merge partial heaps across all 8 partitions: $global")
    }
  }

  test("plan shape: partial heap below the exchange, final above") {
    installed {
      val topk = GroupedTopKOps.groupedTopK(
        Tables(spark, sf001, "orders"),
        Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")), 2)
      topk.collect()
      val plan = topk.queryExecution.executedPlan.toString
      assert(plan.contains("GroupedTopKPartial"), plan)
      assert(plan.contains("GroupedTopKFinal"), plan)
      val partialIdx = plan.indexOf("GroupedTopKPartial")
      val exchangeIdx = plan.indexOf("Exchange hashpartitioning(o_custkey")
      val finalIdx = plan.indexOf("GroupedTopKFinal")
      assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
        s"final above exchange above partial:\n$plan")
      // the differentiator vs the native WindowGroupLimit path (which sorts
      // every partition before its partial limit and again before
      // WindowExec): the heap plan contains NO sort at all
      assert(!plan.contains("Sort "), s"heap plan must be sort-free:\n$plan")
    }
  }

  test("partial pass bounds rows entering the shuffle to k per key per partition") {
    installed {
      // 4 input partitions x 2 keys x 40k rows: the window form would
      // shuffle all 40k rows; the partial heap may emit at most
      // k * keys * partitions = 5 * 2 * 4 = 40
      val df = spark.range(0, 40000, 1, 4)
        .select((col("id") % 2).as("key"), col("id").as("v"))
      val topk = GroupedTopKOps.groupedTopK(df, Seq(col("key")), Seq(col("v")), 5)
      val rows = topk.collect()
      assert(rows.length == 10) // 2 keys x 5

      val written = graft.SparkSpec.allPlanNodes(topk.queryExecution.executedPlan)
        .collect {
          case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => ex
        }
        .flatMap(_.metrics.get("shuffleRecordsWritten")).map(_.value).sum
      assert(written <= 40, s"partial heap must bound the shuffle, wrote $written rows")

      // and the result stayed exact: the true smallest values per key
      val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (0 until 2).flatMap(key =>
        (0 until 5).map(i => (key.toLong, (key + 2 * i).toLong))).toSet
      assert(got == expected, s"got $got")
    }
  }
}
