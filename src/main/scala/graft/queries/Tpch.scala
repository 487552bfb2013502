package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Headline analytic queries in the public TPC-H shapes (pricing summary,
  * large-order HAVING join). These are the bench workhorses: wide scans, big
  * shuffled aggregations, map-side partial aggregation, broadcastable dims.
  */
object Tpch {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  // factors (1 ± x) as exact decimals — cast BEFORE multiplying so no
  // rounding ever happens on a .xx5 tie (Spark HALF_UP vs DuckDB differ there)
  private def fac(c: org.apache.spark.sql.Column) = c.cast(DecimalType(4, 2))

  // Q1-shaped pricing summary: one scan of lineitem, hash aggregate with
  // map-side combine on a 2-value grouping key; no join, no window. At 100 TB
  // this is the pure-throughput yardstick.
  private val q1 = GQuery(
    "q01_pricing_summary", "agg-battery B2 B3",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * fac(lit(1.0) - col("l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) * fac(lit(1.0) - col("l_discount"))
            * fac(lit(1.0) + col("l_tax"))).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
              COUNT(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  // Q18-shaped: aggregate + HAVING threshold, then join back to orders —
  // group-filter-join. The grouped side shrinks drastically before the join,
  // so AQE can flip it to broadcast at runtime.
  private val q18 = GQuery(
    "q18_large_orders", "agg-having-join B7",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
        .where(col("total_qty") > 150.0)
      o.join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("total_qty"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, big.total_qty
            FROM orders o JOIN (
              SELECT l_orderkey,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150.0) big
            ON o.o_orderkey = big.l_orderkey
            ORDER BY o.o_orderkey"""))

  // Q6-shaped selective revenue filter: conjunctive range predicates that all
  // push to the parquet scan (PlanSpec-style PushedFilters), then a single
  // global aggregate — the pushdown showcase. At 100 TB with date-partitioned
  // storage the l_shipdate predicate becomes partition pruning.
  private val q6 = GQuery(
    "q06_revenue_filter", "pushdown-agg B1 B2",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(
          sum(dec(col("l_extendedprice")) * fac(col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n")),
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
              COUNT(*) AS n
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"""))

  // Q3-shaped shipping-priority: filter both sides, join, aggregate revenue
  // per order, top-10 by revenue — the join+agg+top-k composite. The filters
  // push to both scans; the top-k is a TakeOrderedAndProject over the
  // aggregate, never a full sort.
  private val q3 = GQuery(
    "q03_shipping_priority", "join-agg-topk B6 B7",
    (s, dir) => {
      val c = Tables(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = Tables(s, dir, "orders")
        .where(col("o_orderdate") < "1998-01-01")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice")) * fac(lit(1.0) - col("l_discount")))
          .cast("double").as("revenue"))
        .select(col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("""SELECT o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY o.o_orderkey, o.o_orderdate
            ORDER BY revenue DESC, o.o_orderkey LIMIT 10"""))

  val queries: Seq[GQuery] = Seq(q1, q3, q6, q18)
}
