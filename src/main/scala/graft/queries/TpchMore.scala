package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The remaining public TPC-H query shapes (beyond graft.queries.Tpch),
  * adapted where the fixture schema lacks a table/column (no partsupp, no
  * l_commitdate/l_receiptdate/l_shipmode, no p_container — each adaptation
  * preserves the query's operator COMPOSITION and swaps only the filtered
  * column). With these, all 22 TPC-H patterns run oracle-gated: the full
  * join/subquery/aggregate taxonomy a warehouse engine must plan well.
  *
  * Numeric discipline matches Tpch.scala: money sums accumulate as exact
  * DECIMAL(18,2)-derived values and only the final result casts to double,
  * so Spark and DuckDB hash-match bit-for-bit. Quantities in the fixtures
  * are integral doubles (< 2^53), so double sums/averages over them are
  * order-independent and exact in both engines.
  */
object TpchMore {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  private def fac(c: org.apache.spark.sql.Column) = c.cast(DecimalType(4, 2))
  private def rev = dec(col("l_extendedprice")) * fac(lit(1.0) - col("l_discount"))

  // Q4-shaped order-priority check: date-sliced orders, EXISTS over lineitem
  // correlated on BOTH a key and an inequality across the two tables
  // (l_shipdate > o_orderdate stands in for the missing commit/receipt pair).
  // Decorrelates to a left-semi join on orderkey with the inequality as
  // residual — the semi join dedups the multi-lineitem matches before the
  // priority rollup, so the count never inflates.
  private val q4 = GQuery(
    "q04_priority_check", "exists-semi-agg B5",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      o.join(li,
          col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority"""))

  // Q7-shaped volume shipping: the nation-PAIR query — supplier nation and
  // customer nation must form one of two ordered pairs (a disjunctive
  // cross-dimension residual), grouped by both nations and ship year. The
  // 10-to-100-row supplier and nation dims broadcast; the only shuffles are
  // lineitem⋈orders (orderkey) and ⋈customer (custkey) — at 100 TB the two
  // irreducible fact exchanges.
  private val q7 = GQuery(
    "q07_volume_shipping", "multijoin-pair-disjunction B7",
    (s, dir) => {
      val n = Tables(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val sup = Tables(s, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables(s, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1998-01-01")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .where((col("supp_nation") === "NATION_15" && col("cust_nation") === "NATION_18") ||
          (col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_15"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              year(l.l_shipdate) AS l_year,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
              AND ((sn.n_name = 'NATION_15' AND cn.n_name = 'NATION_18')
                OR (sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_15'))
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3"""))

  // Q8-shaped market share: one nation's fraction of a market's volume per
  // year. The market = ASIA-region customers buying STANDARD-type parts;
  // the share is a conditional-sum / total-sum ratio — both sums accumulate
  // as exact decimals and the single division happens on the final doubles,
  // so the ratio is bit-stable across engines.
  private val q8 = GQuery(
    "q08_market_share", "conditional-share-ratio B7 B11",
    (s, dir) => {
      val market = Tables(s, dir, "customer")
        .join(broadcast(Tables(s, dir, "nation")
            .join(broadcast(Tables(s, dir, "region").where(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val sup = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val p = Tables(s, dir, "part").where(col("p_type") === "STANDARD")
        .select(col("p_partkey"))
      val o = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(market, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_15", rev).otherwise(lit(0))).cast("double") /
            sum(rev).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    },
    Some("""SELECT year(o.o_orderdate) AS o_year,
              CAST(SUM(CASE WHEN sn.n_name = 'NATION_15'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1.0 - l.l_discount AS DECIMAL(4,2)) ELSE 0 END) AS DOUBLE)
                / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS mkt_share
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE p.p_type = 'STANDARD'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              AND o.o_custkey IN (
                SELECT c.c_custkey FROM customer c
                JOIN nation n ON c.c_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
                WHERE r.r_name = 'ASIA')
            GROUP BY 1 ORDER BY 1"""))

  // Q9-shaped product-type profit: profit per supplier nation per order year
  // over a part-name substring family. Cost side adapts ps_supplycost to
  // p_retailprice·quantity (the schema's only cost signal); the profit
  // expression stays an exact decimal difference until the final cast.
  private val q9 = GQuery(
    "q09_product_profit", "multijoin-profit-rollup B7",
    (s, dir) => {
      val p = Tables(s, dir, "part").where(col("p_name").like("%widget%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val sup = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(rev - dec(col("p_retailprice")) * dec(col("l_quantity")))
          .cast("double").as("sum_profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    },
    Some("""SELECT n.n_name, year(o.o_orderdate) AS o_year,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * CAST(1.0 - l.l_discount AS DECIMAL(4,2))
                - CAST(p.p_retailprice AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE p.p_name LIKE '%widget%'
            GROUP BY 1, 2
            ORDER BY n.n_name, o_year DESC"""))

  // Q11-shaped important stock: per-part inventory value filtered against a
  // scalar multiple of the AVERAGE per-part value — the
  // aggregate-over-aggregate + scalar-subquery-threshold pattern (partsupp
  // value adapts to extendedprice·quantity from well-funded suppliers; the
  // relative threshold, unlike Q11's absolute fraction, stays selective but
  // non-empty at every scale factor). The grouped frame is computed ONCE and
  // reused for both the per-part rows and the threshold. The average is
  // derived as exact-decimal-sum / exact-count, THEN cast — never a double
  // sum — so the boundary comparison is bit-identical in both engines.
  private val q11 = GQuery(
    "q11_important_stock", "agg-over-agg scalar-threshold B5",
    (s, dir) => {
      val sup = Tables(s, dir, "supplier").where(col("s_acctbal") > 1000.0)
        .select(col("s_suppkey"))
      val perPart = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"), col("l_quantity"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).as("value_dec"))
      val threshold = perPart
        .agg((lit(1.5) * sum(col("value_dec")).cast("double") / count(lit(1)))
          .as("thr"))
      perPart.crossJoin(broadcast(threshold))
        .where(col("value_dec").cast("double") > col("thr"))
        .select(col("l_partkey"), col("value_dec").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some("""WITH v AS (
              SELECT l_partkey,
                SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS value_dec
              FROM lineitem
              WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 1000.0)
              GROUP BY l_partkey)
            SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value
            FROM v
            WHERE CAST(value_dec AS DOUBLE) >
              (SELECT 1.5 * CAST(SUM(value_dec) AS DOUBLE) / COUNT(*) FROM v)
            ORDER BY value DESC, l_partkey"""))

  // Q12-shaped shipping-mode priority split: fact-fact join + dual
  // conditional counts (CASE inside SUM) per group — l_returnflag stands in
  // for the missing l_shipmode; the priority split is Q12's verbatim CASE
  // pair over o_orderpriority.
  private val q12 = GQuery(
    "q12_priority_split", "join conditional-counts B10 B11",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .select(col("l_orderkey"), col("l_returnflag"))
      val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .as("low_line_count"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l.l_returnflag,
              CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l.l_returnflag
            ORDER BY l.l_returnflag"""))

  // Q13-shaped customer order-count distribution: LEFT OUTER join (customers
  // with zero qualifying orders must survive with count 0) followed by a
  // second aggregation over the first's result — the two-level rollup whose
  // outer key is itself an aggregate.
  private val q13 = GQuery(
    "q13_customer_distribution", "outer-join two-level-agg C25",
    (s, dir) => {
      val o = Tables(s, dir, "orders").where(col("o_orderstatus") =!= "F")
        .select(col("o_orderkey"), col("o_custkey"))
      Tables(s, dir, "customer").select(col("c_custkey"))
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, COUNT(*) AS custdist
            FROM (
              SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
              FROM customer c
              LEFT JOIN orders o
                ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
              GROUP BY c.c_custkey)
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC"""))

  // Q14-shaped promo revenue: single-month scan, broadcast part join, and a
  // conditional-sum / total-sum percentage — the conditional-aggregate ratio
  // in its 1-row form.
  private val q14 = GQuery(
    "q14_promo_revenue", "conditional-ratio B11",
    (s, dir) => {
      val p = Tables(s, dir, "part").select(col("p_partkey"), col("p_type"))
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= "1996-03-01" && col("l_shipdate") < "1996-04-01")
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0))).cast("double") /
          sum(rev).cast("double")).as("promo_revenue"))
    },
    Some("""SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * CAST(1.0 - l.l_discount AS DECIMAL(4,2)) ELSE 0 END) AS DOUBLE)
              / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS promo_revenue
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
              AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"""))

  // Q15-shaped top supplier: quarterly revenue per supplier, then keep the
  // supplier(s) hitting the MAX — the scalar-max-over-a-derived-view
  // pattern. The per-supplier frame computes once; its 1-row max broadcasts
  // back. Revenue equality compares doubles derived identically from exact
  // decimal sums, so ties (the reason Q15 returns a set) are hash-stable.
  private val q15 = GQuery(
    "q15_top_supplier", "derived-view scalar-max B5 B6",
    (s, dir) => {
      val revPerSupp = Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
        .groupBy(col("l_suppkey"))
        .agg(sum(rev).cast("double").as("total_revenue"))
      val mx = revPerSupp.agg(max(col("total_revenue")).as("mx"))
      val sup = Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      revPerSupp.crossJoin(broadcast(mx))
        .where(col("total_revenue") === col("mx"))
        .join(broadcast(sup), col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""WITH r AS (
              SELECT l_suppkey,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
              GROUP BY l_suppkey)
            SELECT s.s_suppkey, s.s_name, r.total_revenue
            FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
            WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM r)
            ORDER BY s.s_suppkey"""))

  // Q17-shaped small-quantity revenue: per-part average quantity (correlated
  // AVG subquery) decorrelated to a grouped aggregate joined back with an
  // INEQUALITY against the average — the q02 pattern with < instead of =.
  // Quantities are integral doubles, so the averages are exact and the
  // comparison is engine-stable.
  private val q17 = GQuery(
    "q17_small_quantity_revenue", "correlated-avg-inequality B5",
    (s, dir) => {
      val p = Tables(s, dir, "part").where(col("p_brand") === "Brand#3")
        .select(col("p_partkey"))
      val li = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
      val avgQ = li.groupBy(col("l_partkey"))
        .agg(avg(col("l_quantity")).as("aq"))
        .withColumnRenamed("l_partkey", "aq_partkey")
      li.join(avgQ, col("l_partkey") === col("aq_partkey"))
        .where(col("l_quantity") < lit(0.5) * col("aq"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"))
    },
    Some("""WITH fl AS (
              SELECT l_partkey, l_quantity, l_extendedprice
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')),
            a AS (SELECT l_partkey, AVG(l_quantity) AS aq FROM fl GROUP BY l_partkey)
            SELECT CAST(SUM(CAST(fl.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
            FROM fl JOIN a ON fl.l_partkey = a.l_partkey
            WHERE fl.l_quantity < 0.5 * a.aq"""))

  // Q19-shaped discounted revenue: a DISJUNCTION of conjunctive
  // brand/size/quantity bands as the join residual (p_size bands stand in
  // for the missing p_container). The planner must keep the equi-key
  // (partkey) as the hash join key and evaluate the OR-of-ANDs as residual
  // filter — never a cartesian.
  private val q19 = GQuery(
    "q19_banded_revenue", "disjunctive-residual-join B7",
    (s, dir) => {
      val p = Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey") &&
          ((col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
           (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 20)) ||
           (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 30))))
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n"))
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
              COUNT(*) AS n
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
                   AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
                   AND l.l_quantity BETWEEN 20 AND 30)"""))

  // Q20-shaped part promotion: suppliers who shipped MORE than a threshold
  // quantity of a part-name family in a year — the nested-IN pattern
  // (supplier IN grouped-HAVING subquery over lineitem⋈part). Decorrelates
  // to a left-semi join against the grouped frame; quantities are integral
  // so the HAVING threshold is exact.
  private val q20 = GQuery(
    "q20_excess_shippers", "nested-in-having semi-join B5 C1",
    (s, dir) => {
      val widget = Tables(s, dir, "part").where(col("p_name").like("%widget%"))
        .select(col("p_partkey"))
      val heavy = Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
        .join(broadcast(widget), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .where(col("qty") > 300.0)
      Tables(s, dir, "supplier")
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name
            FROM supplier
            WHERE s_suppkey IN (
              SELECT l_suppkey FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
                AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              GROUP BY l_suppkey
              HAVING SUM(l_quantity) > 300.0)
            ORDER BY s_suppkey"""))

  // ------------------------------------------------------------------- x209
  // Benford first-digit audit — the classic fabricated-data / unit-drift
  // detector run over the money column: observed first-significant-digit
  // shares vs Benford's log10(1 + 1/d) expectation, with the per-digit
  // chi-square contribution. Everything is integer-exact: the first
  // digit comes from the CENTS integer's decimal string (no log10 float
  // near digit boundaries), shares are milli, expectations are milli
  // literals, contributions milli — so a statistical audit hash-verifies.
  // (TPC-H prices are synthetic-uniform, NOT Benford — the large chi
  // values are the audit working, not failing; the gate is arithmetic.)
  // Scale shape: one narrow scan, one 9-group aggregate.
  private val x209 = GQuery(
    "x209_benford_audit", "ext-dq benford first-digit audit",
    (s, dir) => {
      val exp = "array(301, 176, 125, 97, 79, 67, 58, 51, 46)"
      Tables(s, dir, "lineitem")
        .select(substring(round(col("l_extendedprice") * 100, 0)
          .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.unboundedFollowing)))
        .withColumn("share_milli", expr("(1000 * n) div total"))
        .select(col("digit"), col("n"), col("share_milli"),
          expr(s"cast(element_at($exp, digit) as bigint)").as("exp_milli"))
        .withColumn("chi_milli",
          expr("((share_milli - exp_milli) * (share_milli - exp_milli) * 1000) " +
            "div (exp_milli * 1000)"))
        .orderBy("digit")
    },
    Some("""WITH d AS (
              SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100, 0)
                  AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
              FROM lineitem),
            g AS (
              SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total
              FROM d GROUP BY 1),
            e AS (
              SELECT digit, n, (1000 * n) // total AS share_milli,
                CAST([301, 176, 125, 97, 79, 67, 58, 51, 46][digit]
                  AS BIGINT) AS exp_milli
              FROM g)
            SELECT digit, n, share_milli, exp_milli,
              ((share_milli - exp_milli) * (share_milli - exp_milli) * 1000)
                // (exp_milli * 1000) AS chi_milli
            FROM e ORDER BY digit"""))

  // ------------------------------------------------------------------- x212
  // ABC (Pareto) classification — inventory analytics' standard cut:
  // parts ranked by exact decimal revenue, classified by CUMULATIVE
  // revenue share (A ≤ 80 %, B ≤ 95 %, C the tail), reported as the
  // per-class census (part count, revenue, shares — all in exact
  // tenth-cent BIGINTs and integer milli-shares, so the classification
  // hash-verifies; revenue follows b07's decimal discipline:
  // dec(12,2) · dec(4,2) products sum exactly).
  //
  // Scale shape: one fact aggregate to the PART dimension, then a
  // cumulative window over the part-domain table (dimension-sized —
  // the x106/x119 bound), then a 3-group rollup.
  private val x212 = GQuery(
    "x212_abc_classification", "ext-analytics pareto abc-classes",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rev = Tables(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg((sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
            (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2))) * 10000)
          .cast("long").as("rev_tc"))
      val cum = Window.orderBy(col("rev_tc").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val all = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      rev
        .withColumn("cum_tc", sum(col("rev_tc")).over(cum))
        .withColumn("total_tc", sum(col("rev_tc")).over(all))
        .withColumn("cum_milli", expr("(1000 * cum_tc) div total_tc"))
        .withColumn("abc_class",
          when(col("cum_milli") <= 800, "A")
            .when(col("cum_milli") <= 950, "B").otherwise("C"))
        .groupBy("abc_class")
        .agg(count(lit(1)).as("n_parts"), sum(col("rev_tc")).as("class_rev_tc"),
          max(col("total_tc")).as("total_tc"))
        .withColumn("share_milli", expr("(1000 * class_rev_tc) div total_tc"))
        .select(col("abc_class"), col("n_parts"), col("class_rev_tc"),
          col("share_milli"))
        .orderBy("abc_class")
    },
    Some("""WITH rev AS (
              SELECT l_partkey,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  CAST(1.0 - l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)
                  AS rev_tc
              FROM lineitem GROUP BY 1),
            c AS (
              SELECT l_partkey, rev_tc,
                CAST(SUM(rev_tc) OVER (ORDER BY rev_tc DESC, l_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tc,
                CAST(SUM(rev_tc) OVER () AS BIGINT) AS total_tc
              FROM rev),
            k AS (
              SELECT *, (1000 * cum_tc) // total_tc AS cum_milli,
                CASE WHEN (1000 * cum_tc) // total_tc <= 800 THEN 'A'
                     WHEN (1000 * cum_tc) // total_tc <= 950 THEN 'B'
                     ELSE 'C' END AS abc_class
              FROM c)
            SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
              CAST(SUM(rev_tc) AS BIGINT) AS class_rev_tc,
              (1000 * CAST(SUM(rev_tc) AS BIGINT)) // MAX(total_tc)
                AS share_milli
            FROM k GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x220
  // Gini coefficient of customer-revenue concentration per market segment —
  // the standard inequality statistic (G = (2·Σ i·xᵢ − (n+1)·Σx)/(n·Σx)
  // over ascending-sorted xᵢ), reported in exact integer micros. Revenue
  // follows x212's decimal-cents discipline; the sorted index i is
  // tie-robust (equal xᵢ swap i without changing Σ i·xᵢ). The ×10⁶
  // numerator can cross 2⁶³ at warehouse scale, so that one product runs
  // in DECIMAL(38,0) (HUGEINT on the oracle side) before the integral
  // divide back to BIGINT.
  //
  // Scale shape: one fact aggregate to the customer dimension, a
  // per-segment rank window over the CUSTOMER table (dimension-sized —
  // the x212 bound), then a 5-row rollup.
  private val x220 = GQuery(
    "x220_gini_concentration", "ext-analytics inequality gini-index",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val custRev = Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
        .agg((sum(col("o_totalprice").cast(DecimalType(12, 2))) * 100)
          .cast("long").as("cents"))
      val w = Window.partitionBy("segment")
        .orderBy(col("cents"), col("c_custkey"))
      custRev
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
          sum(expr("i * cents")).as("six"))
        .select(col("segment"), col("n"), col("sx"),
          expr("cast((cast(2 * six - (n + 1) * sx as decimal(38,0)) " +
            "* 1000000) div (n * sx) as bigint)").as("gini_micro"))
        .orderBy("segment")
    },
    Some("""WITH cr AS (
              SELECT c.c_mktsegment AS segment, c.c_custkey,
                CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) * 100
                  AS BIGINT) AS cents
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2),
            r AS (
              SELECT segment, cents,
                CAST(ROW_NUMBER() OVER (PARTITION BY segment
                  ORDER BY cents, c_custkey) AS BIGINT) AS i
              FROM cr),
            g AS (
              SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(cents) AS BIGINT) AS sx,
                CAST(SUM(i * cents) AS BIGINT) AS six
              FROM r GROUP BY 1)
            SELECT segment, n, sx,
              CAST((CAST(2 * six - (n + 1) * sx AS HUGEINT) * 1000000)
                // (n * sx) AS BIGINT) AS gini_micro
            FROM g ORDER BY segment"""))

  // ------------------------------------------------------------------- x221
  // Herfindahl–Hirschman concentration of supplier revenue within each
  // nation — the antitrust-standard market-concentration index. Shares
  // quantize to exact integer BASIS POINTS first ((x·10⁴) div X), then
  // HHI = Σ s_bp² — the classic 0–10⁸ scale (10⁸ = monopoly), integer end
  // to end, so a normally-float index hash-verifies. Quantizing before
  // squaring is the same determinism trade the engine's micro-rounding
  // discipline makes everywhere (documented bias < 2·10⁻⁴ of full scale).
  //
  // Scale shape: one fact aggregate to the supplier dimension, one
  // nation-total window over the SUPPLIER table, one 25-row rollup.
  private val x221 = GQuery(
    "x221_hhi_concentration", "ext-analytics market-concentration hhi",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val supRev = Tables(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg((sum(dec(col("l_extendedprice"))) * 100).cast("long").as("cents"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(Tables(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("l_suppkey"), col("cents"))
      supRev
        .withColumn("nat_total", sum(col("cents")).over(
          Window.partitionBy(col("n_name"))))
        .withColumn("s_bp", expr("(cents * 10000) div nat_total"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(expr("s_bp * s_bp")).as("hhi_bp2"))
        .orderBy("n_name")
    },
    Some("""WITH sr AS (
              SELECT n.n_name, l.l_suppkey,
                CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS cents
              FROM lineitem l
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN nation n ON s.s_nationkey = n.n_nationkey
              GROUP BY 1, 2),
            sh AS (
              SELECT n_name,
                (cents * 10000)
                  // CAST(SUM(cents) OVER (PARTITION BY n_name) AS BIGINT)
                  AS s_bp
              FROM sr)
            SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
              CAST(SUM(s_bp * s_bp) AS BIGINT) AS hhi_bp2
            FROM sh GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x231
  // Pearson correlation profile — the data-profiling pass every warehouse
  // runs to find redundant/derived columns before modeling (quantity vs
  // extended price SHOULD correlate; discount should not). All moments
  // accumulate as exact integers (quantity integral, money in cents,
  // discount in hundredths; per-row products fit BIGINT, the SUMS ride
  // DECIMAL(38,0)/HUGEINT), so both engines reach the identical exact
  // rationals; the only floating steps are the final sqrt/divide on those
  // exact values plus one round to micros — the x228 discipline.
  //
  // Scale shape: ONE map-side-combinable aggregate over the fact table
  // computes every moment; the 3-row unpivot is driver-free.
  private val x231 = GQuery(
    "x231_corr_profile", "ext-analytics data-profiling pearson-correlation",
    (s, dir) => {
      val d38 = DecimalType(38, 0)
      val li = Tables(s, dir, "lineitem").select(
        col("l_quantity").cast("long").as("q"),
        (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
          .cast("long").as("p"),
        (col("l_discount").cast(DecimalType(4, 2)) * 100)
          .cast("long").as("d"))
      val m = li.agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sq"), sum(col("p")).as("sp"), sum(col("d")).as("sd"),
        sum((col("q") * col("q")).cast(d38)).as("sqq"),
        sum((col("p") * col("p")).cast(d38)).as("spp"),
        sum((col("d") * col("d")).cast(d38)).as("sdd"),
        sum((col("q") * col("p")).cast(d38)).as("sqp"),
        sum((col("q") * col("d")).cast(d38)).as("sqd"),
        sum((col("p") * col("d")).cast(d38)).as("spd"))
      def corr(x: String, y: String, sxy: String) = expr(
        s"""cast(round(
             cast(cast(n as decimal(38,0)) * $sxy
               - cast(s$x as decimal(38,0)) * s$y as double)
             / (sqrt(cast(cast(n as decimal(38,0)) * s$x$x
                 - cast(s$x as decimal(38,0)) * s$x as double))
               * sqrt(cast(cast(n as decimal(38,0)) * s$y$y
                 - cast(s$y as decimal(38,0)) * s$y as double)))
             * 1000000, 0) as bigint)""")
      m.select(col("n"),
          corr("q", "p", "sqp").as("c_qp"),
          corr("q", "d", "sqd").as("c_qd"),
          corr("p", "d", "spd").as("c_pd"))
        .selectExpr("n",
          "stack(3, 'price_disc', c_pd, 'qty_disc', c_qd, 'qty_price', c_qp)" +
            " as (pair, corr_micro)")
        .select(col("pair"), col("n"), col("corr_micro"))
        .orderBy("pair")
    },
    Some("""WITH li AS (
              SELECT CAST(l_quantity AS BIGINT) AS q,
                CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  AS p,
                CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS d
              FROM lineitem),
            m AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(p) AS BIGINT) AS sp,
                CAST(SUM(d) AS BIGINT) AS sd,
                SUM(CAST(q * q AS HUGEINT)) AS sqq,
                SUM(CAST(p * p AS HUGEINT)) AS spp,
                SUM(CAST(d * d AS HUGEINT)) AS sdd,
                SUM(CAST(q * p AS HUGEINT)) AS sqp,
                SUM(CAST(q * d AS HUGEINT)) AS sqd,
                SUM(CAST(p * d AS HUGEINT)) AS spd
              FROM li),
            c AS (
              SELECT 'qty_price' AS pair, n,
                CAST(round(
                  CAST(CAST(n AS HUGEINT) * sqp
                    - CAST(sq AS HUGEINT) * sp AS DOUBLE)
                  / (sqrt(CAST(CAST(n AS HUGEINT) * sqq
                      - CAST(sq AS HUGEINT) * sq AS DOUBLE))
                    * sqrt(CAST(CAST(n AS HUGEINT) * spp
                      - CAST(sp AS HUGEINT) * sp AS DOUBLE)))
                  * 1000000, 0) AS BIGINT) AS corr_micro
              FROM m
              UNION ALL
              SELECT 'qty_disc', n,
                CAST(round(
                  CAST(CAST(n AS HUGEINT) * sqd
                    - CAST(sq AS HUGEINT) * sd AS DOUBLE)
                  / (sqrt(CAST(CAST(n AS HUGEINT) * sqq
                      - CAST(sq AS HUGEINT) * sq AS DOUBLE))
                    * sqrt(CAST(CAST(n AS HUGEINT) * sdd
                      - CAST(sd AS HUGEINT) * sd AS DOUBLE)))
                  * 1000000, 0) AS BIGINT)
              FROM m
              UNION ALL
              SELECT 'price_disc', n,
                CAST(round(
                  CAST(CAST(n AS HUGEINT) * spd
                    - CAST(sp AS HUGEINT) * sd AS DOUBLE)
                  / (sqrt(CAST(CAST(n AS HUGEINT) * spp
                      - CAST(sp AS HUGEINT) * sp AS DOUBLE))
                    * sqrt(CAST(CAST(n AS HUGEINT) * sdd
                      - CAST(sd AS HUGEINT) * sd AS DOUBLE)))
                  * 1000000, 0) AS BIGINT)
              FROM m)
            SELECT pair, n, corr_micro FROM c ORDER BY pair"""))

  // ------------------------------------------------------------------- x239
  // Lorenz decile table — the CURVE behind x220's Gini scalar: customers
  // ranked by revenue into deciles, each decile's share and cumulative
  // share of total revenue in exact milli (the "bottom 50% hold 21%"
  // read an inequality audit actually reports). NTILE over the
  // (cents, custkey) total order is identical in both engines; shares
  // are integer divisions of exact cents.
  //
  // Scale shape: one fact aggregate to the customer dimension, one
  // dimension-sized rank window, a 10-row rollup + domain windows.
  private val x239 = GQuery(
    "x239_lorenz_deciles", "ext-analytics inequality lorenz-curve",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val custRev = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast(DecimalType(12, 2))) * 100)
          .cast("long").as("cents"))
      val w = Window.orderBy(col("cents"), col("o_custkey"))
      val deciles = custRev
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("cents_total"))
      val cum = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      val all = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      deciles
        .withColumn("grand", sum(col("cents_total")).over(all))
        .withColumn("cum_cents", sum(col("cents_total")).over(cum))
        .select(col("decile"), col("n_customers"), col("cents_total"),
          expr("(1000 * cents_total) div grand").as("share_milli"),
          expr("(1000 * cum_cents) div grand").as("cum_share_milli"))
        .orderBy("decile")
    },
    Some("""WITH cr AS (
              SELECT o_custkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100
                  AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            d AS (
              SELECT CAST(NTILE(10) OVER (ORDER BY cents, o_custkey)
                AS BIGINT) AS decile, cents
              FROM cr),
            g AS (
              SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
                CAST(SUM(cents) AS BIGINT) AS cents_total
              FROM d GROUP BY 1)
            SELECT decile, n_customers, cents_total,
              (1000 * cents_total) // CAST(SUM(cents_total) OVER () AS BIGINT)
                AS share_milli,
              (1000 * CAST(SUM(cents_total) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT))
                // CAST(SUM(cents_total) OVER () AS BIGINT)
                AS cum_share_milli
            FROM g ORDER BY decile"""))

  // ------------------------------------------------------------------- x240
  // Exact weighted median — order quantity weighted by revenue cents,
  // per return flag: "the quantity at which half the MONEY sits below"
  // (the unweighted median c24 answers a different question when order
  // sizes and values correlate, as x231 shows they do). Lower weighted
  // median by the (quantity, revenue-rank) total order: first value
  // whose cumulative weight reaches half the total — all integer cents,
  // both engines walk the same cumulative sums.
  //
  // Scale shape: one map-combinable aggregate to the (flag, quantity)
  // grid (quantity domain ≤ 50 values), cumulative windows over the
  // GRID — facts never sort (the x219 domain discipline).
  private val x240 = GQuery(
    "x240_weighted_median", "ext-analytics weighted-median exact",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val grid = Tables(s, dir, "lineitem").groupBy(
          col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("qty"))
        .agg((sum(dec(col("l_extendedprice"))) * 100).cast("long").as("w"))
      val cum = Window.partitionBy("flag").orderBy("qty")
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = Window.partitionBy("flag")
      grid
        .withColumn("cw", sum(col("w")).over(cum))
        .withColumn("tw", sum(col("w")).over(tot))
        .where(col("cw") * 2 >= col("tw"))
        .groupBy("flag")
        .agg(min(col("qty")).as("wmedian_qty"), max(col("tw")).as("total_cents"))
        .orderBy("flag")
    },
    Some("""WITH grid AS (
              SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS w
              FROM lineitem GROUP BY 1, 2),
            c AS (
              SELECT flag, qty,
                CAST(SUM(w) OVER (PARTITION BY flag ORDER BY qty
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cw,
                CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
              FROM grid)
            SELECT flag, CAST(MIN(qty) AS BIGINT) AS wmedian_qty,
              CAST(MAX(tw) AS BIGINT) AS total_cents
            FROM c WHERE cw * 2 >= tw
            GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x244
  // Spearman rank correlation per market segment — does a customer's
  // revenue RANK track their order-count rank? The monotone-association
  // companion to x231's linear Pearson (a heavy-tailed revenue column can
  // decorrelate linearly while staying perfectly monotone). Tie-aware:
  // both engines build 2-SCALED average ranks (2·avgrank = 2·RANK +
  // ties−1, an exact integer — fractional .5 average ranks never appear),
  // then Pearson-of-ranks over exact DECIMAL(38,0)/HUGEINT moments — the
  // textbook tie-corrected Spearman, float-free until the final
  // sqrt/divide/round (the x231 discipline).
  //
  // Scale shape: one fact aggregate to the customer dimension, then
  // dimension-sized rank windows partitioned by segment (5 partitions
  // over |customers| rows — never fact-sized), one map-combinable moment
  // aggregate per segment.
  private val x244 = GQuery(
    "x244_spearman_rank", "ext-analytics spearman rank-correlation",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d38 = DecimalType(38, 0)
      val cust = Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
        .agg((sum(col("o_totalprice").cast(DecimalType(12, 2))) * 100)
          .cast("long").as("cents"),
          count(lit(1)).as("n_orders"))
      val ranked = cust
        .withColumn("rx2",
          rank().over(Window.partitionBy("segment").orderBy("cents"))
            .cast("long") * 2
            + count(lit(1)).over(Window.partitionBy("segment", "cents")) - 1)
        .withColumn("ry2",
          rank().over(Window.partitionBy("segment").orderBy("n_orders"))
            .cast("long") * 2
            + count(lit(1)).over(Window.partitionBy("segment", "n_orders"))
            - 1)
      ranked.groupBy("segment")
        .agg(count(lit(1)).as("n"),
          sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
          sum((col("rx2") * col("rx2")).cast(d38)).as("sxx"),
          sum((col("ry2") * col("ry2")).cast(d38)).as("syy"),
          sum((col("rx2") * col("ry2")).cast(d38)).as("sxy"))
        .select(col("segment"), col("n"),
          expr("""cast(round(
               cast(cast(n as decimal(38,0)) * sxy
                 - cast(sx as decimal(38,0)) * sy as double)
               / (sqrt(cast(cast(n as decimal(38,0)) * sxx
                   - cast(sx as decimal(38,0)) * sx as double))
                 * sqrt(cast(cast(n as decimal(38,0)) * syy
                   - cast(sy as decimal(38,0)) * sy as double)))
               * 1000000, 0) as bigint)""").as("rho_micro"))
        .orderBy("segment")
    },
    Some("""WITH cust AS (
              SELECT c.c_mktsegment AS segment, o.o_custkey,
                CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) * 100
                  AS BIGINT) AS cents,
                CAST(COUNT(*) AS BIGINT) AS n_orders
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2),
            r AS (
              SELECT segment,
                CAST(RANK() OVER (PARTITION BY segment ORDER BY cents)
                  AS BIGINT) * 2
                  + CAST(COUNT(*) OVER (PARTITION BY segment, cents)
                    AS BIGINT) - 1 AS rx2,
                CAST(RANK() OVER (PARTITION BY segment ORDER BY n_orders)
                  AS BIGINT) * 2
                  + CAST(COUNT(*) OVER (PARTITION BY segment, n_orders)
                    AS BIGINT) - 1 AS ry2
              FROM cust),
            m AS (
              SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(rx2) AS BIGINT) AS sx,
                CAST(SUM(ry2) AS BIGINT) AS sy,
                SUM(CAST(rx2 * rx2 AS HUGEINT)) AS sxx,
                SUM(CAST(ry2 * ry2 AS HUGEINT)) AS syy,
                SUM(CAST(rx2 * ry2 AS HUGEINT)) AS sxy
              FROM r GROUP BY 1)
            SELECT segment, n,
              CAST(round(
                CAST(CAST(n AS HUGEINT) * sxy
                  - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                    - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                  * sqrt(CAST(CAST(n AS HUGEINT) * syy
                    - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
                * 1000000, 0) AS BIGINT) AS rho_micro
            FROM m ORDER BY segment"""))

  // ------------------------------------------------------------------- x245
  // Mann–Whitney U per return flag — do PROMO parts ship in different
  // quantities than non-promo parts? The distribution-free two-sample
  // test (Mann & Whitney 1947) an A/B readout uses when t-test normality
  // fails. Computed WITHOUT a pooled fact-table sort: aggregate both
  // samples to the (flag, quantity) DOMAIN grid (≤ 50 values), then
  // 2U₁ = Σ_v n1_v·(2·|{group2 < v}| + n2_v) — the rank-sum identity with
  // the tie ½-credits kept integral by the doubling. Rank-biserial effect
  // size r = 2U/(n1·n2) − 1 is the only division, done on exact integers
  // as doubles then rounded to micros (the x231 finishing step).
  //
  // Scale shape: one map-combinable aggregate to the domain grid, grid
  // windows (≤ 50 rows per flag), a 3-row rollup. Facts never sort — the
  // x240 domain discipline.
  private val x245 = GQuery(
    "x245_mannwhitney_u", "ext-analytics mann-whitney two-sample",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d38 = DecimalType(38, 0)
      val grid = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("qty"))
        .agg(sum(when(col("p_type").startsWith("PROMO"), 1L).otherwise(0L))
          .as("n1v"),
          sum(when(col("p_type").startsWith("PROMO"), 0L).otherwise(1L))
            .as("n2v"))
      val cum = Window.partitionBy("flag").orderBy("qty")
        .rowsBetween(Window.unboundedPreceding, 0)
      grid
        .withColumn("c2lt", sum(col("n2v")).over(cum) - col("n2v"))
        .groupBy("flag")
        .agg(sum(col("n1v")).as("n1"), sum(col("n2v")).as("n2"),
          sum((col("n1v") * (col("c2lt") * 2 + col("n2v"))).cast(d38))
            .as("u2"))
        .select(col("flag"), col("n1"), col("n2"),
          col("u2").cast("long").as("u_doubled"),
          expr("""cast(round(
               cast(u2 - cast(n1 as decimal(38,0)) * n2 as double)
               / cast(cast(n1 as decimal(38,0)) * n2 as double)
               * 1000000, 0) as bigint)""").as("rb_micro"))
        .orderBy("flag")
    },
    Some("""WITH grid AS (
              SELECT l.l_returnflag AS flag,
                CAST(l.l_quantity AS BIGINT) AS qty,
                CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1v,
                CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN 0 ELSE 1 END)
                  AS BIGINT) AS n2v
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              GROUP BY 1, 2),
            c AS (
              SELECT flag, qty, n1v, n2v,
                CAST(SUM(n2v) OVER (PARTITION BY flag ORDER BY qty
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - n2v AS c2lt
              FROM grid),
            m AS (
              SELECT flag, CAST(SUM(n1v) AS BIGINT) AS n1,
                CAST(SUM(n2v) AS BIGINT) AS n2,
                SUM(CAST(n1v * (2 * c2lt + n2v) AS HUGEINT)) AS u2
              FROM c GROUP BY 1)
            SELECT flag, n1, n2, CAST(u2 AS BIGINT) AS u_doubled,
              CAST(round(
                CAST(u2 - CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
                / CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
                * 1000000, 0) AS BIGINT) AS rb_micro
            FROM m ORDER BY flag"""))

  // ------------------------------------------------------------------- x246
  // Kendall tau-b between quantity and discount — the concordance test
  // (Kendall 1938) with the tau-b tie normalization both columns need on
  // a coarse grid. Computed on the JOINT DOMAIN GRID (≤ 50 quantities ×
  // 11 discounts): concordant/discordant mass from the grid's pair
  // lattice (cell-count products, q strictly increasing), tie terms from
  // the marginals — every term an exact integer in DECIMAL(38,0)/HUGEINT,
  // with n² headroom for 100 TB row counts; the single float step is the
  // final (C−D)/√((n0−n1)(n0−n2)) on exact values, rounded to micros.
  //
  // Scale shape: one map-combinable aggregate to the ≤550-cell grid; the
  // pair lattice is grid×grid (≤ 550² bounded rows — whitelisted in the
  // registry cartesian gate like the x214/x228 domain lattices); facts
  // never pair.
  private val x246 = GQuery(
    "x246_kendall_tau", "ext-analytics kendall-tau concordance",
    (s, dir) => {
      val d38 = DecimalType(38, 0)
      val cells = Tables(s, dir, "lineitem")
        .groupBy(col("l_quantity").cast("long").as("q"),
          (col("l_discount").cast(DecimalType(4, 2)) * 100).cast("long")
            .as("d"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // reread by lattice + both marginals
      val pairs = cells.select(col("q").as("q1"), col("d").as("d1"),
          col("c").as("c1"))
        .join(cells.select(col("q").as("q2"), col("d").as("d2"),
          col("c").as("c2")), col("q1") < col("q2"))
        .agg(
          sum(when(col("d1") < col("d2"),
            (col("c1") * col("c2")).cast(d38)).otherwise(lit(0).cast(d38)))
            .as("cc"),
          sum(when(col("d1") > col("d2"),
            (col("c1") * col("c2")).cast(d38)).otherwise(lit(0).cast(d38)))
            .as("dd"))
      val tot = cells.agg(sum(col("c")).as("nn"))
        .select(expr("cast(nn as decimal(38,0)) * (nn - 1) / 2")
          .cast(d38).as("n0"))
      val tq = cells.groupBy("q").agg(sum(col("c")).as("t"))
        .agg(sum(expr("cast(t as decimal(38,0)) * (t - 1) / 2").cast(d38))
          .as("n1"))
      val td = cells.groupBy("d").agg(sum(col("c")).as("t"))
        .agg(sum(expr("cast(t as decimal(38,0)) * (t - 1) / 2").cast(d38))
          .as("n2"))
      pairs.crossJoin(broadcast(tot)).crossJoin(broadcast(tq))
        .crossJoin(broadcast(td))
        .select(col("cc").cast("long").as("concordant"),
          col("dd").cast("long").as("discordant"),
          expr("""cast(round(
               cast(cc - dd as double)
               / (sqrt(cast(n0 - n1 as double))
                 * sqrt(cast(n0 - n2 as double)))
               * 1000000, 0) as bigint)""").as("tau_micro"))
    },
    Some("""WITH cells AS (
              SELECT CAST(l_quantity AS BIGINT) AS q,
                CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS d,
                CAST(COUNT(*) AS BIGINT) AS c
              FROM lineitem GROUP BY 1, 2),
            cd AS (
              SELECT
                SUM(CASE WHEN a.d < b.d
                  THEN CAST(a.c * b.c AS HUGEINT) ELSE 0 END) AS cc,
                SUM(CASE WHEN a.d > b.d
                  THEN CAST(a.c * b.c AS HUGEINT) ELSE 0 END) AS dd
              FROM cells a JOIN cells b ON a.q < b.q),
            tot AS (
              SELECT CAST(SUM(c) AS HUGEINT)
                * (CAST(SUM(c) AS HUGEINT) - 1) // 2 AS n0
              FROM cells),
            tq AS (
              SELECT SUM(CAST(t AS HUGEINT) * (t - 1) // 2) AS n1
              FROM (SELECT CAST(SUM(c) AS BIGINT) AS t
                    FROM cells GROUP BY q)),
            td AS (
              SELECT SUM(CAST(t AS HUGEINT) * (t - 1) // 2) AS n2
              FROM (SELECT CAST(SUM(c) AS BIGINT) AS t
                    FROM cells GROUP BY d))
            SELECT CAST(cc AS BIGINT) AS concordant,
              CAST(dd AS BIGINT) AS discordant,
              CAST(round(
                CAST(cc - dd AS DOUBLE)
                / (sqrt(CAST(n0 - n1 AS DOUBLE))
                  * sqrt(CAST(n0 - n2 AS DOUBLE)))
                * 1000000, 0) AS BIGINT) AS tau_micro
            FROM cd, tot, tq, td"""))

  // ------------------------------------------------------------------- x248
  // Kruskal–Wallis H across the return-flag groups — the k-sample
  // extension of x245's two-sample U (is the quantity distribution the
  // same in ALL THREE flag populations?), tie-corrected. Pooled ranks
  // come off the (qty) DOMAIN grid with the same 2-scaled tie-average
  // trick as x244 (2·avgrank = 2·|below| + |at| + 1 — exact integers),
  // group rank-sum squares ride DECIMAL(38,0)/HUGEINT, and
  // H = Σ_g 3·R2_g²/(N(N+1)·n_g) − 3(N+1) lands as per-group
  // micro-truncated integer terms (the x235 per-cell discipline). The
  // tie factor (N³−N)/(N³−N−Σ(t³−t)) is the one float step, applied to
  // exact operands and rounded to micros. Exactness headroom: R2_g² ≤
  // 4N⁴ caps the all-integer path at N ≈ 10⁹ rows per tested slice —
  // beyond that, shard the statistic (it is sum-decomposable per group)
  // before the final combine.
  //
  // Scale shape: one map-combinable aggregate to the ≤50-value domain
  // grid, grid-sized windows, a 3-row group rollup. Facts never sort.
  private val x248 = GQuery(
    "x248_kruskal_wallis", "ext-analytics kruskal-wallis k-sample",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d38 = DecimalType(38, 0)
      val grid = Tables(s, dir, "lineitem")
        .groupBy(col("l_quantity").cast("long").as("qty"),
          col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // pooled ranks + group rollup reread it
      val pooled = grid.groupBy("qty").agg(sum(col("c")).as("cv"))
        .withColumn("cbelow", coalesce(sum(col("cv")).over(
          Window.orderBy("qty").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("r2", col("cbelow") * 2 + col("cv") + 1)
      val groups = grid
        .join(pooled.select(col("qty"), col("r2")), "qty")
        .groupBy("flag")
        .agg(sum(col("c")).as("n_g"),
          sum((col("c") * col("r2")).cast(d38)).as("r2s"))
      val tot = pooled.agg(sum(col("cv")).as("nn"),
        sum(expr("cast(cv as decimal(38,0)) * cv * cv - cv")).as("tsum"))
      groups.crossJoin(broadcast(tot))
        .withColumn("term_micro",
          expr("""cast((3 * r2s * r2s * 1000000)
               div (cast(nn as decimal(38,0)) * (nn + 1) * n_g) as bigint)"""))
        .withColumn("h_micro",
          sum(col("term_micro")).over(Window.partitionBy())
            - (col("nn") + 1) * 3000000L)
        .withColumn("nn3n", expr("cast(nn as decimal(38,0)) * nn * nn - nn"))
        .select(col("flag"), col("n_g"), col("r2s").cast("long").as("r2_sum"),
          col("h_micro"),
          expr("""cast(round(cast(h_micro as double)
               * (cast(nn3n as double) / cast(nn3n - tsum as double)),
               0) as bigint)""").as("h_tie_micro"))
        .orderBy("flag")
    },
    Some("""WITH grid AS (
              SELECT CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS flag,
                CAST(COUNT(*) AS BIGINT) AS c
              FROM lineitem GROUP BY 1, 2),
            pooled AS (
              SELECT qty, CAST(SUM(c) AS BIGINT) AS cv FROM grid GROUP BY 1),
            p2 AS (
              SELECT qty,
                2 * COALESCE(CAST(SUM(cv) OVER (ORDER BY qty
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) + cv + 1 AS r2
              FROM pooled),
            g AS (
              SELECT grid.flag, CAST(SUM(grid.c) AS BIGINT) AS n_g,
                SUM(CAST(grid.c AS HUGEINT) * p2.r2) AS r2s
              FROM grid JOIN p2 ON p2.qty = grid.qty GROUP BY 1),
            t AS (
              SELECT CAST(SUM(cv) AS BIGINT) AS nn,
                SUM(CAST(cv AS HUGEINT) * cv * cv - cv) AS tsum
              FROM pooled),
            f AS (
              SELECT g.flag, g.n_g, g.r2s, t.nn, t.tsum,
                CAST((3 * g.r2s * g.r2s * 1000000)
                  // (CAST(t.nn AS HUGEINT) * (t.nn + 1) * g.n_g) AS BIGINT)
                  AS term_micro
              FROM g, t),
            h AS (
              SELECT flag, n_g, r2s, nn, tsum,
                CAST(SUM(term_micro) OVER () AS BIGINT)
                  - (nn + 1) * 3000000 AS h_micro
              FROM f)
            SELECT flag, n_g, CAST(r2s AS BIGINT) AS r2_sum, h_micro,
              CAST(round(CAST(h_micro AS DOUBLE)
                * (CAST(CAST(nn AS HUGEINT) * nn * nn - nn AS DOUBLE)
                  / CAST(CAST(nn AS HUGEINT) * nn * nn - nn - tsum
                    AS DOUBLE)),
                0) AS BIGINT) AS h_tie_micro
            FROM h ORDER BY flag"""))

  // ------------------------------------------------------------------- x260
  // Poisson-bootstrap confidence interval (Chamandy, Muralidharan,
  // Najmi & Naidu, Google 2012 — "Estimating Uncertainty for Massive
  // Data Streams"): THE error-bar method that survives 100 TB, because
  // resampling-with-replacement is replaced by per-row Poisson(1)
  // weights — one pass, B weights per row, no shuffle of the data and no
  // N-sized sample materialization. Determinism discipline: the weight
  // for (row, replicate) is drawn by inverse-CDF over the first 4 hex
  // chars of md5(key:replicate) compared against FIXED hex thresholds
  // (the x42 string-ordered-hash idiom — no hex→int conversion, no float
  // RNG), so both engines draw bit-identical weights. Replicate means
  // are exact integer divisions of cents; the interval is the 2nd/31st
  // order statistic of the 32 replicate means (the 30/32 ≈ 94 % central
  // band). One row: n, exact full-sample mean, the band.
  //
  // Scale shape: a 32× in-pipeline replicate fan-out (generator, no
  // exchange) into ONE 32-group partial-aggregated rollup; the order
  // statistics are a 32-row window. The fan-out factor is B, fixed —
  // never data-sized.
  private val x260 = GQuery(
    "x260_poisson_bootstrap", "ext-analytics bootstrap-ci poisson-resampling",
    (s, dir) => {
      // the weight/accumulator/verdict kernel lives in ONE place
      // (graft.queries.Bootstrap), shared with the streaming maintainer
      val rows = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("key"),
          (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
            .cast("long").as("cents"))
        // fan the 32×-replicate md5 kernel out to the session parallelism
        // (round 15, guide §2.6): the checkpoint otherwise pins the
        // scan's byte-sized split count and the whole accumulate pass ran
        // as ONE 3.1 s task on a 32-core box
        .transform(Par.fanOutScan(_, "key"))
        .localCheckpoint(true) // accumulators + totals reread the rows
      Bootstrap.verdict(Bootstrap.accumulate(rows), Bootstrap.totals(rows))
        .select(col("n_rows").as("n_orders"), col("mean_cents"),
          col("ci_lo_cents"), col("ci_hi_cents"))
    },
    Some("""WITH o AS (
              SELECT o_orderkey,
                CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  AS cents
              FROM orders),
            rep AS (
              SELECT o.o_orderkey, o.cents, b.b,
                substr(md5(o.o_orderkey || ':' || b.b), 1, 4) AS h
              FROM o CROSS JOIN
                (SELECT CAST(range AS BIGINT) AS b FROM range(1, 33)) b),
            w AS (
              SELECT b, cents, CASE
                WHEN h < '5e2d' THEN 0 WHEN h < 'bc5e' THEN 1
                WHEN h < 'eb79' THEN 2 WHEN h < 'fb2b' THEN 3
                WHEN h < 'ff10' THEN 4 WHEN h < 'ffd9' THEN 5
                WHEN h < 'fffa' THEN 6 ELSE 7 END AS w
              FROM rep),
            means AS (
              SELECT b, CAST(SUM(CAST(w * cents AS HUGEINT))
                // CAST(SUM(w) AS HUGEINT) AS BIGINT) AS mean_b
              FROM w GROUP BY b HAVING SUM(w) > 0),
            band AS (
              SELECT MAX(CASE WHEN rn = 2 THEN mean_b END) AS ci_lo_cents,
                MAX(CASE WHEN rn = 31 THEN mean_b END) AS ci_hi_cents
              FROM (SELECT mean_b,
                      ROW_NUMBER() OVER (ORDER BY mean_b) AS rn
                    FROM means)),
            tot AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
                CAST(SUM(cents) AS BIGINT) // COUNT(*) AS mean_cents
              FROM o)
            SELECT tot.n_orders, tot.mean_cents,
              band.ci_lo_cents, band.ci_hi_cents
            FROM tot, band"""))

  // ------------------------------------------------------------------- x261
  // Correlation ratio η² + one-way ANOVA F — the continuous-BY-categorical
  // association measure that completes the engine's association matrix
  // (continuous×continuous: x231 Pearson; ranks: x244/x246;
  // categorical×categorical: x235 χ²/x247 V; two-sample location/shape:
  // x245 U/x250 KS): how much of order-value variance does the customer's
  // market segment (k=5) or nation (k=25) explain? Values quantize to
  // floor-dollars (floor(double) is identical in both engines; dollar
  // grain buys 10⁴ headroom on the per-group s²_g div n_g term — the
  // exact path holds to ~10¹³ rows at this value range, stated honestly
  // like x248). Per-group terms are div-truncated integers (the x235
  // per-cell discipline); η²_micro and F_milli are single divisions of
  // exact scaled sums of squares.
  //
  // Scale shape: ONE map-combinable moment aggregate over the fact join,
  // one group-grained rollup per factor, 2-row output. No windows.
  private val x261 = GQuery(
    "x261_correlation_ratio", "ext-analytics anova eta-squared",
    (s, dir) => {
      val d38 = DecimalType(38, 0)
      val o = Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          col("c_nationkey").cast("string").as("nat"),
          expr("cast(floor(o_totalprice) as bigint)").as("x"))
        .localCheckpoint(true) // totals + both factor rollups reread it
      val tot = o.agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"))
      val byGroup = o.select(lit("segment").as("factor"), col("seg").as("grp"),
          col("x"))
        .unionAll(o.select(lit("nation").as("factor"), col("nat").as("grp"),
          col("x")))
        .groupBy("factor", "grp")
        .agg(count(lit(1)).as("n_g"), sum(col("x")).as("s_g"))
      byGroup.groupBy("factor")
        .agg(count(lit(1)).as("k"),
          sum(expr("(cast(s_g as decimal(38,0)) * s_g) div n_g").cast(d38))
            .as("a"))
        .crossJoin(broadcast(tot))
        .withColumn("ss_b", expr("cast(n as decimal(38,0)) * a " +
          "- cast(s as decimal(38,0)) * s"))
        .withColumn("ss_t", expr("cast(n as decimal(38,0)) * sxx " +
          "- cast(s as decimal(38,0)) * s"))
        .select(col("factor"), col("k"), col("n"),
          expr("cast((1000000 * ss_b) div ss_t as bigint)").as("eta2_micro"),
          expr("""cast((1000 * (n - k) * ss_b)
               div ((k - 1) * (ss_t - ss_b)) as bigint)""").as("f_milli"))
        .orderBy("factor")
    },
    Some("""WITH o AS (
              SELECT c.c_mktsegment AS seg,
                CAST(c.c_nationkey AS VARCHAR) AS nat,
                CAST(floor(o.o_totalprice) AS BIGINT) AS x
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
            tot AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS s,
                SUM(CAST(x * x AS HUGEINT)) AS sxx
              FROM o),
            g AS (
              SELECT factor, grp, CAST(COUNT(*) AS BIGINT) AS n_g,
                CAST(SUM(x) AS BIGINT) AS s_g
              FROM (SELECT 'segment' AS factor, seg AS grp, x FROM o
                    UNION ALL SELECT 'nation', nat, x FROM o)
              GROUP BY 1, 2),
            f AS (
              SELECT factor, CAST(COUNT(*) AS BIGINT) AS k,
                SUM(CAST(s_g AS HUGEINT) * s_g // n_g) AS a
              FROM g GROUP BY 1),
            e AS (
              SELECT f.factor, f.k, tot.n,
                CAST(tot.n AS HUGEINT) * f.a
                  - CAST(tot.s AS HUGEINT) * tot.s AS ss_b,
                CAST(tot.n AS HUGEINT) * tot.sxx
                  - CAST(tot.s AS HUGEINT) * tot.s AS ss_t
              FROM f, tot)
            SELECT factor, k, n,
              CAST((1000000 * ss_b) // ss_t AS BIGINT) AS eta2_micro,
              CAST((1000 * (n - k) * ss_b)
                // ((k - 1) * (ss_t - ss_b)) AS BIGINT) AS f_milli
            FROM e ORDER BY factor"""))

  // ------------------------------------------------------------------- x300
  // Benford first-digit audit (Newcomb 1881 / Benford 1938) — the
  // data-forensics read run on any money column before trusting it:
  // naturally-occurring multiplicative amounts follow
  // P(d) = log₁₀(1 + 1/d), and synthetic, capped, or fabricated data
  // does not. The canonical distribution enters as INTEGER MILLI
  // constants (301, 176, 125, 97, 79, 67, 58, 51, 46 — summing 1000),
  // so the per-digit deviation and the total-deviation headline are
  // exact integers in both engines. First digit via floor() (NOT a
  // bigint cast: Spark truncates where DuckDB rounds — floor agrees).
  //
  // Scale shape: one map-side-combinable 9-bucket aggregate over the
  // fact scan, a 9-row broadcast join, a 9-row window.
  private val x300 = GQuery(
    "x300_benford_audit", "ext-profiling forensics benford",
    (s, dir) => {
      import s.implicits._
      val benford = Seq((1L, 301L), (2L, 176L), (3L, 125L), (4L, 97L),
        (5L, 79L), (6L, 67L), (7L, 58L), (8L, 51L), (9L, 46L))
        .toDF("digit", "benford_milli")
      val all = org.apache.spark.sql.expressions.Window
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      // benford is the PRESERVED side, so the broadcast goes on the
      // counts side (Spark cannot build-broadcast the preserved side of
      // an outer join — a hint there is silently ignored, the r10 ADVICE
      // finding); the counts side is a ≤9-row post-aggregate, the
      // cheapest possible build table
      val counts = Tables(s, dir, "orders")
        .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .withColumn("n_total", sum(col("n")).over(all))
      benford
        .join(broadcast(counts), Seq("digit"), "left")
        .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
          max(col("n_total")).over(all).as("n_total"),
          col("benford_milli"))
        .withColumn("share_milli", expr("(1000 * n) div n_total"))
        .withColumn("dev_milli",
          abs(col("share_milli") - col("benford_milli")))
        .withColumn("total_dev_milli", sum(col("dev_milli")).over(all))
        .orderBy("digit")
    },
    Some("""WITH d AS (
              SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                  AS VARCHAR), 1, 1) AS BIGINT) AS digit
              FROM orders),
            c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c),
            bf(digit, benford_milli) AS (VALUES
              (1, 301), (2, 176), (3, 125), (4, 97), (5, 79),
              (6, 67), (7, 58), (8, 51), (9, 46)),
            j AS (
              SELECT bf.digit, COALESCE(c.n, 0) AS n, t.n_total,
                CAST(bf.benford_milli AS BIGINT) AS benford_milli,
                (1000 * COALESCE(c.n, 0)) // t.n_total AS share_milli
              FROM bf LEFT JOIN c ON c.digit = bf.digit CROSS JOIN t)
            SELECT CAST(digit AS BIGINT) AS digit, n, n_total,
              benford_milli, CAST(share_milli AS BIGINT) AS share_milli,
              CAST(abs(share_milli - benford_milli) AS BIGINT) AS dev_milli,
              CAST(SUM(abs(share_milli - benford_milli)) OVER ()
                AS BIGINT) AS total_dev_milli
            FROM j ORDER BY digit"""))

  // ------------------------------------------------------------------- x319
  // Join-key skew audit — the pre-flight read behind every salting/AQE
  // decision this engine makes (SkewSpec exercises the cure; this row
  // measures the disease): the full shape of the l_partkey key-count
  // distribution in exact integers — max key, nearest-rank p50/p99 key
  // counts, the hottest key's row share, skew ratio vs the mean, and how
  // many keys run >2× the mean (the salting candidate set). An operator
  // reads this row and knows whether the x197-style salted join or plain
  // AQE skew handling is warranted BEFORE paying for a bad shuffle.
  //
  // Scale shape: one map-side-combinable per-key count, then everything
  // runs on the count-of-counts DOMAIN (how many keys have count c) —
  // bounded by the distinct count values, not the key count — with
  // cumsum windows for the percentile picks; the fact table is scanned
  // once and never sorted.
  private val x319 = GQuery(
    "x319_key_skew_audit", "ext-planning shuffle-skew audit",
    (s, dir) => {
      val wt = org.apache.spark.sql.expressions.Window.orderBy(col("cnt"))
      val all = org.apache.spark.sql.expressions.Window
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables(s, dir, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("cnt")).agg(count(lit(1)).as("k"))
        .withColumn("c", sum(col("k")).over(wt))
        .withColumn("nk", sum(col("k")).over(all))
        .withColumn("nr", sum(col("cnt") * col("k")).over(all))
        .agg(max(col("nr")).as("n_rows"), max(col("nk")).as("n_keys"),
          max(col("cnt")).as("max_cnt"),
          max(when(expr("c - k < (nk + 1) div 2 AND (nk + 1) div 2 <= c"),
            col("cnt"))).as("p50_cnt"),
          max(when(expr("c - k < (99 * nk + 99) div 100 AND (99 * nk + 99) div 100 <= c"),
            col("cnt"))).as("p99_cnt"),
          sum(when(col("cnt") * col("nk") > lit(2) * col("nr"), col("k"))
            .otherwise(0L)).as("n_hot_keys"))
        .select(col("n_rows"), col("n_keys"),
          expr("(1000 * n_rows) div n_keys").as("mean_cnt_milli"),
          col("p50_cnt"), col("p99_cnt"), col("max_cnt"),
          expr("(1000000 * max_cnt) div n_rows").as("top_share_micro"),
          expr("(1000 * max_cnt * n_keys) div n_rows").as("skew_milli"),
          col("n_hot_keys"))
    },
    Some("""WITH pc AS (
              SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM lineitem GROUP BY 1),
            d AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS k
                  FROM pc GROUP BY 1),
            w AS (SELECT cnt, k,
                    CAST(SUM(k) OVER (ORDER BY cnt) AS BIGINT) AS c,
                    CAST(SUM(k) OVER () AS BIGINT) AS nk,
                    CAST(SUM(cnt * k) OVER () AS BIGINT) AS nr
                  FROM d),
            a AS (SELECT MAX(nr) AS n_rows, MAX(nk) AS n_keys,
                    MAX(cnt) AS max_cnt,
                    MAX(CASE WHEN c - k < (nk + 1) // 2
                      AND (nk + 1) // 2 <= c THEN cnt END) AS p50_cnt,
                    MAX(CASE WHEN c - k < (99 * nk + 99) // 100
                      AND (99 * nk + 99) // 100 <= c THEN cnt END)
                      AS p99_cnt,
                    CAST(SUM(CASE WHEN cnt * nk > 2 * nr THEN k ELSE 0 END)
                      AS BIGINT) AS n_hot_keys
                  FROM w)
            SELECT n_rows, n_keys,
              CAST((1000 * n_rows) // n_keys AS BIGINT) AS mean_cnt_milli,
              p50_cnt, p99_cnt, max_cnt,
              CAST((1000000 * max_cnt) // n_rows AS BIGINT)
                AS top_share_micro,
              CAST((1000 * max_cnt * n_keys) // n_rows AS BIGINT)
                AS skew_milli,
              n_hot_keys
            FROM a"""))

  // ------------------------------------------------------------------- x325
  // Basket-width audit — the distribution that PRICES the co-purchase
  // family's scale claims (x123/x133 bound their per-order pair
  // explosion by basket width): exact histogram of lines-per-order with
  // cumulative milli shares. Width^2 is the pair fan-out; an operator
  // reads max_width off this row and knows the explosion bound before
  // running the graph build. Domain-grid exact, a ~7-row table.
  private val x325 = GQuery(
    "x325_basket_width_audit", "ext-planning fanout-bound audit",
    (s, dir) => {
      val wt = org.apache.spark.sql.expressions.Window.orderBy(col("width"))
      val all = org.apache.spark.sql.expressions.Window
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("width"))
        .groupBy(col("width")).agg(count(lit(1)).as("n_orders"))
        .withColumn("total", sum(col("n_orders")).over(all))
        .withColumn("cum", sum(col("n_orders")).over(wt))
        .select(col("width"), col("n_orders"),
          expr("(1000 * n_orders) div total").as("share_milli"),
          expr("(1000 * cum) div total").as("cum_milli"),
          expr("((width * (width - 1)) div 2) * n_orders")
            .as("pair_fanout"))
        .orderBy("width")
    },
    Some("""WITH w AS (
              SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS width
              FROM lineitem GROUP BY 1),
            d AS (SELECT width, CAST(COUNT(*) AS BIGINT) AS n_orders
                  FROM w GROUP BY 1),
            c AS (SELECT width, n_orders,
                    CAST(SUM(n_orders) OVER () AS BIGINT) AS total,
                    CAST(SUM(n_orders) OVER (ORDER BY width) AS BIGINT)
                      AS cum
                  FROM d)
            SELECT width, n_orders,
              CAST((1000 * n_orders) // total AS BIGINT) AS share_milli,
              CAST((1000 * cum) // total AS BIGINT) AS cum_milli,
              CAST(((width * (width - 1)) // 2) * n_orders AS BIGINT)
                AS pair_fanout
            FROM c ORDER BY width"""))

  // ------------------------------------------------------------------- x344
  // Leave-one-out target-encoding audit (Micci-Barreca 2001) — the
  // feature-prep step a tabular-ML pipeline runs on every high-arity
  // categorical, audited the way leakage review demands: per category,
  // the exact n and mean target, the RANGE the leave-one-out encoding
  // spans (the LOO of the max-target row is the low edge, of the
  // min-target row the high edge — if that spread is wide the encoding
  // leaks the row's own label), and the m=100-smoothed encoding that
  // shrinks small categories toward the global mean. Money rides as
  // exact cents (the x281 idiom); every ratio is a floor division on
  // DECIMAL(38,0), so both engines land identical integers.
  //
  // Scale shape: one category rollup off the fact table, one
  // category-domain window pair for the global sums; nothing per-row
  // survives the first aggregate — the LOO range needs only the
  // category's min/max target, not a per-row join back.
  private val x344 = GQuery(
    "x344_target_encoding", "ext-ml target-encoding loo-leakage audit",
    (s, dir) => {
      val wAll = org.apache.spark.sql.expressions.Window
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables(s, dir, "orders")
        .select(col("o_orderpriority").as("cat"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .groupBy(col("cat"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents").cast("decimal(38,0)")).as("sc"),
          min(col("cents")).as("y_min"), max(col("cents")).as("y_max"))
        .withColumn("s_all", sum(col("sc")).over(wAll))
        .withColumn("n_all", sum(col("n")).over(wAll))
        .select(col("cat"), col("n"),
          expr("cast(sc div n as bigint)").as("mean_cents"),
          expr("""cast(case when n > 1 then (sc - y_max) div (n - 1) end
               as bigint)""").as("loo_low_cents"),
          expr("""cast(case when n > 1 then (sc - y_min) div (n - 1) end
               as bigint)""").as("loo_high_cents"),
          expr("""cast((sc + 100 * (s_all div n_all)) div (n + 100)
               as bigint)""").as("enc_smooth_cents"))
        .orderBy("cat")
    },
    Some("""WITH o AS (
              SELECT o_orderpriority AS cat,
                CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
              FROM orders),
            g AS (
              SELECT cat, CAST(COUNT(*) AS BIGINT) AS n,
                SUM(CAST(cents AS HUGEINT)) AS sc,
                MIN(cents) AS y_min, MAX(cents) AS y_max
              FROM o GROUP BY 1),
            t AS (SELECT *, SUM(sc) OVER () AS s_all,
                SUM(n) OVER () AS n_all FROM g)
            SELECT cat, n,
              CAST(sc // n AS BIGINT) AS mean_cents,
              CAST(CASE WHEN n > 1 THEN (sc - y_max) // (n - 1) END
                AS BIGINT) AS loo_low_cents,
              CAST(CASE WHEN n > 1 THEN (sc - y_min) // (n - 1) END
                AS BIGINT) AS loo_high_cents,
              CAST((sc + 100 * (s_all // n_all)) // (n + 100) AS BIGINT)
                AS enc_smooth_cents
            FROM t ORDER BY 1"""))

  // ------------------------------------------------------------------- x346
  // One-way ANOVA, exact-integer form (Fisher 1925) — the parametric
  // mean-comparison the rank battery (x248 Kruskal-Wallis, x245
  // Mann-Whitney) deliberately avoids, completing the pair every stats
  // consumer expects. Defined on cent-exact targets with FLOORED group
  // means (m_g = S_g div n_g) so the sums of squares are pure integer
  // arithmetic both engines reproduce bit-for-bit: ssb = Σ n_g(m_g−m)²,
  // ssw = Σ(Q_g − 2·m_g·S_g + n_g·m_g²), F in milli-units as
  // (1000·ssb·(n−k)) div (ssw·(k−1)), effect size η² alongside. The
  // floored-mean definition changes the statistic by <1 part in 10⁶ on
  // cent-scale targets while making it an exactly-specified integer —
  // the same trade every milli-unit row in this registry makes.
  //
  // Scale shape: one group rollup off the fact table (map-side
  // combinable sums of y and y²), then a k-row fold. DECIMAL(38,0)
  // throughout: Σy² is ~10²⁶ at 10¹² rows of 10⁷-cent targets; the F
  // composition holds exact headroom through ~10¹⁰ rows at cent
  // precision (beyond, feed whole-currency units).
  private val x346 = GQuery(
    "x346_anova_oneway", "ext-stats anova one-way exact",
    (s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderpriority").as("grp"),
          round(col("o_totalprice") * 100, 0).cast("long").as("y"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n_g"),
          sum(col("y").cast("decimal(38,0)")).as("s_g"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("q_g"))
        .withColumn("m_g", expr("cast(s_g div n_g as decimal(38,0))"))
        .agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
          sum(col("s_g")).as("s"),
          sum(expr("q_g - 2 * m_g * s_g + n_g * m_g * m_g")).as("ssw"),
          sum(col("n_g") * col("m_g")).as("nm"),
          sum(expr("n_g * m_g * m_g")).as("nmm"))
        .withColumn("m", expr("cast(s div n as decimal(38,0))"))
        .withColumn("ssb", expr("nmm - 2 * m * nm + n * m * m"))
        .select(col("k").cast("long").as("k_groups"),
          expr("cast(n as bigint)").as("n_rows"),
          expr("cast((1000 * ssb * (n - k)) div (ssw * (k - 1)) as bigint)")
            .as("f_milli"),
          expr("cast((1000 * ssb) div (ssb + ssw) as bigint)")
            .as("eta2_milli"))
    },
    Some("""WITH o AS (
              SELECT o_orderpriority AS grp,
                CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y
              FROM orders),
            g AS (
              SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n_g,
                SUM(CAST(y AS HUGEINT)) AS s_g,
                SUM(CAST(y AS HUGEINT) * y) AS q_g
              FROM o GROUP BY 1),
            gm AS (SELECT *, s_g // n_g AS m_g FROM g),
            f AS (
              SELECT CAST(COUNT(*) AS HUGEINT) AS k, SUM(n_g) AS n,
                SUM(s_g) AS s,
                SUM(q_g - 2 * m_g * s_g + n_g * m_g * m_g) AS ssw,
                SUM(n_g * m_g) AS nm,
                SUM(n_g * m_g * m_g) AS nmm
              FROM gm),
            fm AS (SELECT *, s // n AS m,
                nmm - 2 * (s // n) * nm + n * (s // n) * (s // n) AS ssb
              FROM f)
            SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_rows,
              CAST((1000 * ssb * (n - k)) // (ssw * (k - 1)) AS BIGINT)
                AS f_milli,
              CAST((1000 * ssb) // (ssb + ssw) AS BIGINT) AS eta2_milli
            FROM fm"""))

  // ------------------------------------------------------------------- x355
  // Hot-key coverage curve — the working-set table behind every
  // cache / broadcast / hot-tier decision: if we pin the top-K part
  // keys (K ∈ {10, 100, 1000}), what share of lineitem traffic do they
  // absorb? Exact: per-key counts, rank by (count desc, key), coverage
  // as floor-division millis. The complement of x319's skew AUDIT —
  // skew as an asset to exploit (cache the head) rather than a hazard
  // to salt away. Reads directly as "a 1000-key broadcast side covers
  // N‰ of probe traffic".
  //
  // Scale shape: one fact rollup to the key domain, then key-domain
  // windows and a 3-row cutoff explode of the RANKED key table (the
  // unpartitioned rank is over the key domain, never the fact table).
  private val x355 = GQuery(
    "x355_hot_key_coverage", "ext-layout hot-key working-set curve",
    (s, dir) => {
      val wAll = org.apache.spark.sql.expressions.Window
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      val wRank = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("l_partkey"))
      Tables(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .withColumn("total_rows", sum(col("cnt")).over(wAll))
        .withColumn("total_keys", count(lit(1)).over(wAll))
        .select(explode(expr("array(10L, 100L, 1000L)")).as("top_k"),
          col("cnt"), col("rk"), col("total_rows"), col("total_keys"))
        .where(col("rk") <= col("top_k"))
        .groupBy(col("top_k"))
        .agg(count(lit(1)).as("keys_used"),
          max(col("total_keys")).as("total_keys"),
          sum(col("cnt")).as("rows_covered"),
          max(col("total_rows")).as("total_rows"))
        .withColumn("coverage_milli",
          expr("cast((1000 * rows_covered) div total_rows as bigint)"))
        .orderBy("top_k")
    },
    Some("""WITH c AS (
              SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM lineitem GROUP BY 1),
            r AS (
              SELECT cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC,
                  l_partkey) AS BIGINT) AS rk,
                CAST(SUM(cnt) OVER () AS BIGINT) AS total_rows,
                CAST(COUNT(*) OVER () AS BIGINT) AS total_keys
              FROM c)
            SELECT CAST(top_k AS BIGINT) AS top_k,
              CAST(COUNT(*) AS BIGINT) AS keys_used,
              MAX(total_keys) AS total_keys,
              CAST(SUM(cnt) AS BIGINT) AS rows_covered,
              MAX(total_rows) AS total_rows,
              CAST((1000 * SUM(cnt)) // MAX(total_rows) AS BIGINT)
                AS coverage_milli
            FROM r CROSS JOIN (SELECT unnest([10, 100, 1000]) AS top_k)
            WHERE rk <= top_k GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x358
  // Simpson-reversal scan — x289 AUDITS one known aggregation reversal;
  // this SCANS the candidate-confounder menu the way an analyst actually
  // hunts one: fix the comparison (urgent-priority vs standard orders,
  // measured by mean order value), then for each candidate stratifier
  // (order status, order year, customer-key residue class), count the
  // strata whose within-stratum direction CONTRADICTS the aggregate
  // direction. The sign test is exact without any division:
  // sign(mean₁ − mean₂) == sign(S₁·n₂ − S₂·n₁) — cross-multiplied
  // DECIMAL(38,0) products, never a floored mean. A confounder whose
  // strata majority-contradict the aggregate is the Simpson flag.
  //
  // Scale shape: one fact scan exploded 3× by candidate (candidate
  // count is schema-bounded), one (candidate, stratum, arm) rollup,
  // stratum-domain sign arithmetic, 3-row output.
  private val x358 = GQuery(
    "x358_simpson_scan", "ext-stats simpson-reversal confounder scan",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(
          when(col("o_orderpriority") < "3", 1L).otherwise(0L).as("arm"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          col("o_orderstatus"), col("o_orderdate"), col("o_custkey"))
        .select(col("arm"), col("cents"), explode(expr(
          """array(
               named_struct('cand', 'status', 'stratum', o_orderstatus),
               named_struct('cand', 'year', 'stratum',
                 cast(year(o_orderdate) as string)),
               named_struct('cand', 'cust_mod4', 'stratum',
                 cast(o_custkey % 4 as string)))""")).as("x"))
        .select(col("arm"), col("cents"), col("x.cand").as("cand"),
          col("x.stratum").as("stratum"))
      val cell = o.groupBy(col("cand"), col("stratum"), col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents").cast("decimal(38,0)")).as("sc"))
      val strata = cell.groupBy(col("cand"), col("stratum"))
        .agg(sum(when(col("arm") === 1L, col("sc"))).as("s1"),
          sum(when(col("arm") === 1L, col("n"))).as("n1"),
          sum(when(col("arm") === 0L, col("sc"))).as("s0"),
          sum(when(col("arm") === 0L, col("n"))).as("n0"))
        .where(col("n1").isNotNull && col("n0").isNotNull)
        .withColumn("sgn", expr(
          """case when s1 * n0 > s0 * n1 then 1
               when s1 * n0 < s0 * n1 then -1 else 0 end"""))
      val wC = org.apache.spark.sql.expressions.Window.partitionBy(col("cand"))
      strata
        .withColumn("agg_sgn", expr(
          """case when sum(s1) over (partition by cand)
                   * sum(n0) over (partition by cand)
                 > sum(s0) over (partition by cand)
                   * sum(n1) over (partition by cand) then 1
               when sum(s1) over (partition by cand)
                   * sum(n0) over (partition by cand)
                 < sum(s0) over (partition by cand)
                   * sum(n1) over (partition by cand) then -1
               else 0 end"""))
        .groupBy(col("cand"))
        .agg(count(lit(1)).as("n_strata"),
          max(col("agg_sgn")).cast("long").as("agg_sign"),
          sum(when(col("sgn") =!= col("agg_sgn"), 1L).otherwise(0L))
            .as("n_contradicting"))
        .withColumn("simpson_flag",
          col("n_contradicting") * 2L > col("n_strata"))
        .orderBy("cand")
    },
    Some("""WITH o AS (
              SELECT CASE WHEN o_orderpriority < '3' THEN 1 ELSE 0 END
                  AS arm,
                CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                o_orderstatus, o_orderdate, o_custkey
              FROM orders),
            e AS (
              SELECT arm, cents, 'status' AS cand,
                o_orderstatus AS stratum FROM o
              UNION ALL
              SELECT arm, cents, 'year',
                CAST(year(o_orderdate) AS VARCHAR) FROM o
              UNION ALL
              SELECT arm, cents, 'cust_mod4',
                CAST(o_custkey % 4 AS VARCHAR) FROM o),
            cell AS (
              SELECT cand, stratum, arm, CAST(COUNT(*) AS BIGINT) AS n,
                SUM(CAST(cents AS HUGEINT)) AS sc
              FROM e GROUP BY 1, 2, 3),
            st AS (
              SELECT cand, stratum,
                SUM(CASE WHEN arm = 1 THEN sc END) AS s1,
                SUM(CASE WHEN arm = 1 THEN n END) AS n1,
                SUM(CASE WHEN arm = 0 THEN sc END) AS s0,
                SUM(CASE WHEN arm = 0 THEN n END) AS n0
              FROM cell GROUP BY 1, 2),
            sg AS (
              SELECT *, CASE WHEN s1 * n0 > s0 * n1 THEN 1
                  WHEN s1 * n0 < s0 * n1 THEN -1 ELSE 0 END AS sgn,
                CASE WHEN SUM(s1) OVER (PARTITION BY cand)
                      * SUM(n0) OVER (PARTITION BY cand)
                    > SUM(s0) OVER (PARTITION BY cand)
                      * SUM(n1) OVER (PARTITION BY cand) THEN 1
                  WHEN SUM(s1) OVER (PARTITION BY cand)
                      * SUM(n0) OVER (PARTITION BY cand)
                    < SUM(s0) OVER (PARTITION BY cand)
                      * SUM(n1) OVER (PARTITION BY cand) THEN -1
                  ELSE 0 END AS agg_sgn
              FROM st WHERE n1 IS NOT NULL AND n0 IS NOT NULL)
            SELECT cand, CAST(COUNT(*) AS BIGINT) AS n_strata,
              CAST(MAX(agg_sgn) AS BIGINT) AS agg_sign,
              CAST(SUM(CASE WHEN sgn <> agg_sgn THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contradicting,
              CAST(SUM(CASE WHEN sgn <> agg_sgn THEN 1 ELSE 0 END)
                AS BIGINT) * 2 > CAST(COUNT(*) AS BIGINT) AS simpson_flag
            FROM sg GROUP BY 1 ORDER BY 1"""))

  val queries: Seq[GQuery] =
    Seq(q4, q7, q8, q9, q11, q12, q13, q14, q15, q17, q19, q20, x209, x212,
      x220, x221, x231, x239, x240, x244, x245, x246, x248, x260, x261,
      x300, x319, x325, x344, x346, x355, x358)
}
