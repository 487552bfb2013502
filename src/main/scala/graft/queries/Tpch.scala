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

  // Q2-shaped "cheapest supplier per part": correlated MIN subquery
  // decorrelated to a per-part aggregate joined back on (partkey, price) —
  // the other classic decorrelation next to b05b's count form. The grouped
  // side shrinks to one row per part, so AQE can flip the equality join to
  // broadcast at runtime; part (selective filter) and supplier (names) are
  // planner-broadcast. Price equality is exact: both engines compare the
  // same stored doubles, and MIN picks one of them, not a computed value.
  // (This schema has no partsupp table — lineitem is the part↔supplier
  // link, preserving Q2's join/subquery composition.)
  private val q2 = GQuery(
    "q02_min_cost_supplier", "correlated-min-join B5 B7",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      val minPrice = li.groupBy(col("l_partkey"))
        .agg(min(col("l_extendedprice")).as("min_price"))
        .withColumnRenamed("l_partkey", "mp_partkey") // disambiguate self-join
      val p = Tables(s, dir, "part")
        .where(col("p_size") <= 5)
        .select(col("p_partkey"), col("p_name"))
      val sup = Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      li.join(minPrice,
          col("l_partkey") === col("mp_partkey") &&
            col("l_extendedprice") === col("min_price"))
        .join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .join(broadcast(sup), col("s_suppkey") === col("l_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"),
          col("l_extendedprice").as("price"))
        .orderBy("p_partkey", "s_name")
    },
    Some("""WITH m AS (
              SELECT l_partkey, MIN(l_extendedprice) AS min_price
              FROM lineitem GROUP BY l_partkey)
            SELECT p.p_partkey, p.p_name, s.s_name, l.l_extendedprice AS price
            FROM lineitem l
            JOIN m ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.min_price
            JOIN part p ON p.p_partkey = l.l_partkey AND p.p_size <= 5
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            ORDER BY p.p_partkey, s.s_name"""))

  // Q22-shaped "rich customers with no big-ticket order": scalar aggregate
  // subquery (average positive balance) broadcast as a 1-row join, anti join
  // against qualifying orders, then a grouped rollup. The three-stage
  // composition — scalar subquery, NOT EXISTS, aggregate — is the last
  // TPC-H pattern family not yet in the bench. (Every customer here has
  // SOME order, so the NOT EXISTS carries Q22's usual pushed predicate to
  // stay non-vacuous.) The filtered anti-join side shrinks to big-ticket
  // orders only, so AQE flips it to broadcast; the threshold comparison
  // happens on the same stored doubles in both engines.
  private val q22 = GQuery(
    "q22_no_order_customers", "scalar-subquery anti-join B5 C2",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val thr = c.where(col("c_acctbal") > 0.0)
        .agg(avg(col("c_acctbal")).as("thr"))
      val o = Tables(s, dir, "orders")
        .where(col("o_totalprice") > 300000.0) // pushes to the scan
        .select(col("o_custkey"))
      c.crossJoin(broadcast(thr))
        .where(col("c_acctbal") > col("thr"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS numcust,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
            FROM customer c
            WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
              AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // Q10-shaped "returned-item customers": fact-to-fact join (orders filtered
  // by date range pushed to the scan, lineitem filtered by returnflag), dims
  // broadcast, grouped revenue rollup, top-20. The selective order-side
  // filter shrinks that join input so AQE can flip the orderkey join to
  // broadcast; revenue uses the exact-decimal product (q01's pattern) so
  // rows and sort order hash-match.
  private val q10 = GQuery(
    "q10_returned_items", "join-agg-topk B7",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
      val n = Tables(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * fac(lit(1.0) - col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-04-01'
              AND l.l_returnflag = 'R'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c.c_custkey LIMIT 20"""))

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

  // Q5-shaped local-supplier revenue: the multi-dimension join WITH a cycle —
  // customer and supplier must share a nation (c_nationkey = s_nationkey)
  // while lineitem links them through orders. Dims (region→nation→supplier)
  // collapse via broadcasts; the only shuffles are lineitem⋈orders on
  // orderkey and the customer join on custkey — the minimum for two big
  // sides. The nation cycle rides along as a residual equi-condition, never
  // a cartesian.
  private val q5 = GQuery(
    "q05_local_supplier_revenue", "multijoin-cycle B7",
    (s, dir) => {
      val region = Tables(s, dir, "region").where(col("r_name") === "ASIA")
      val nation = Tables(s, dir, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables(s, dir, "supplier")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val o = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
        .select(col("o_orderkey"), col("o_custkey"))
      val c = Tables(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * fac(lit(1.0) - col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n.n_name,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n.n_name
            ORDER BY revenue DESC, n.n_name"""))

  // Q16-shaped supplier-part diversity: distinct-aggregate over a join with a
  // NOT-IN exclusion subquery (here: low-balance suppliers, since this schema
  // carries supplier linkage on lineitem rather than partsupp). The exclusion
  // is a broadcast anti-join; count(distinct) expands to the two-phase
  // partial/final aggregate over (group key, suppkey).
  private val q16 = GQuery(
    "q16_supplier_part_types", "distinct-agg-antijoin",
    (s, dir) => {
      val excluded = Tables(s, dir, "supplier")
        .where(col("s_acctbal") < 2000.0).select(col("s_suppkey"))
      val p = Tables(s, dir, "part")
        .where(col("p_brand") =!= "Brand#45")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    },
    Some("""SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand <> 'Brand#45'
              AND l.l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0)
            GROUP BY p.p_brand, p.p_size
            ORDER BY supplier_cnt DESC, p.p_brand, p.p_size"""))

  // Q21-shaped "last shipper in multi-supplier orders": the correlated
  // EXISTS + NOT EXISTS pair on the same fact table (this schema has no
  // commit/receipt dates, so "kept the order waiting" becomes "shipped last",
  // preserving the operator composition exactly). Decorrelates to a
  // left-semi join (another supplier exists on the order) followed by a
  // left-anti join with an inequality residual (no other supplier shipped
  // later). Both shuffle on l_orderkey, so the second join reuses the
  // first's exchange; supplier names broadcast at the end.
  private val q21 = GQuery(
    "q21_last_shipper", "exists-antiexists-composite",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val others = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val othersLater = li.select(col("l_orderkey").as("ok3"),
        col("l_suppkey").as("sk3"), col("l_shipdate").as("sd3"))
      val sup = Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      li
        .join(others,
          col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
          "left_semi")
        .join(othersLater,
          col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3") &&
            col("sd3") > col("l_shipdate"),
          "left_anti")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
    Some("""SELECT s.s_name, COUNT(*) AS numwait
            FROM supplier s
            JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
            WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate > l1.l_shipdate)
            GROUP BY s.s_name
            ORDER BY numwait DESC, s.s_name
            LIMIT 20"""))

  val queries: Seq[GQuery] = Seq(q1, q2, q3, q5, q6, q10, q16, q18, q21, q22)
}
