package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** The reference's relational surface (SURVEY.md §2.B, Grafana SQL at
  * grafana/provisioning/dashboards/msconvert.json:20,48,77,101,142 and the
  * verify_batch ORM counts at dags/msconvert_dag.py:450-474), re-expressed over
  * the fixture tables, plus the §2.C coverage sweep of relational operators the
  * reference delegates to its SQL engine.
  *
  * Determinism rules (the DuckDB oracle hash-compares results):
  *   - money/quantity sums go through DECIMAL(18,2) then cast to double: the
  *     decimal sum is exact, so the result is identical regardless of Spark's
  *     partition-order of additions — double sums would be non-associative.
  *   - every query ends in a total ORDER BY on a unique key set.
  *   - timestamps are compared at microsecond precision (Spark's native
  *     resolution; oracle SQL casts DuckDB's ns/ms values to TIMESTAMP).
  */
object Relational {

  /** Exact, partition-order-independent sum of a double column at 2 decimals. */
  private def moneySum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Money column as exact decimal. Factors like (1 - discount) must be cast
    * to decimal BEFORE multiplying: the product of two 2-decimal values lands
    * exactly on .xx5 rounding ties, where Spark (HALF_UP) and DuckDB disagree
    * — decimal×decimal keeps everything exact and tie-free.
    */
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  private def events(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  // ---------------------------------------------------------------- B1/B2
  // Reference: "Files converted (24 h)" — conjunctive filter + count
  // (grafana msconvert.json:20). NOW() is replaced by max(ts) so the result is
  // deterministic over the fixed fixture.
  private val b01 = GQuery(
    "b01_filter_scan", "B1 A2-A4",
    (s, dir) => {
      Tables.views(s, dir, Seq("events"))
      s.sql("""
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
        FROM events
        WHERE event_type = 'purchase' AND value > 100
          AND ts > (SELECT max(ts) FROM events) - INTERVAL 24 HOURS
        ORDER BY event_id""")
    },
    Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
            FROM events
            WHERE event_type = 'purchase' AND value > 100
              AND ts > (SELECT max(ts) FROM events) - INTERVAL 24 HOURS
            ORDER BY event_id"""))

  private val b02 = GQuery(
    "b02_count_24h", "B2",
    (s, dir) => {
      Tables.views(s, dir, Seq("events"))
      s.sql("""
        SELECT count(*) AS converted FROM events
        WHERE event_type = 'purchase'
          AND ts > (SELECT max(ts) FROM events) - INTERVAL 24 HOURS""")
    },
    Some("""SELECT count(*) AS converted FROM events
            WHERE event_type = 'purchase'
              AND ts > (SELECT max(ts) FROM events) - INTERVAL 24 HOURS"""))

  // ---------------------------------------------------------------- B3
  // Reference: ROUND(AVG(EXTRACT(EPOCH FROM end_date-start_date)/60)::numeric,1)
  // (grafana msconvert.json:48). The avg is computed as exact-decimal-sum /
  // count so both engines divide the same two numbers.
  private val b03 = GQuery(
    "b03_avg_minutes", "B3",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(moneySum(col("value")) / (count(lit(1)) * lit(60.0)), 1).as("avg_minutes"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
              ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / (COUNT(*) * 60.0), 1) AS avg_minutes,
              COUNT(*) AS n
            FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------- B4
  // Reference flagship: hourly tumbling-window series (grafana msconvert.json:77).
  private val b04 = GQuery(
    "b04_hourly_series", "B4",
    (s, dir) =>
      events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("converted"))
        .orderBy("hour"),
    Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, COUNT(*) AS converted
            FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- B5
  // Reference: per-dag_run correlated scalar subqueries (grafana
  // msconvert.json:101). Literal correlated form — Catalyst decorrelates.
  private val b05 = GQuery(
    "b05_correlated_counts", "B5",
    (s, dir) => {
      Tables.views(s, dir, Seq("events"))
      s.sql("""
        SELECT u.user_id,
          (SELECT COUNT(*) FROM events e WHERE e.user_id = u.user_id) AS total,
          (SELECT COUNT(*) FROM events e WHERE e.user_id = u.user_id AND e.event_type = 'error') AS failed,
          (SELECT COUNT(*) FROM events e WHERE e.user_id = u.user_id AND e.event_type = 'purchase') AS purchased
        FROM (SELECT DISTINCT user_id FROM events) u
        ORDER BY user_id""")
    },
    Some("""SELECT u.user_id,
              (SELECT COUNT(*) FROM events e WHERE e.user_id = u.user_id) AS total,
              (SELECT COUNT(*) FROM events e WHERE e.user_id = u.user_id AND e.event_type = 'error') AS failed,
              (SELECT COUNT(*) FROM events e WHERE e.user_id = u.user_id AND e.event_type = 'purchase') AS purchased
            FROM (SELECT DISTINCT user_id FROM events) u
            ORDER BY user_id"""))

  // Same semantics, hand-decorrelated to a single grouped pass (the plan shape
  // Catalyst should reach on its own; one shuffle instead of three).
  private val b05b = GQuery(
    "b05b_decorrelated_join", "B5",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("total"),
          count_if(col("event_type") === "error").as("failed"),
          count_if(col("event_type") === "purchase").as("purchased"))
        .orderBy("user_id"),
    Some("""SELECT user_id, COUNT(*) AS total,
              COUNT(*) FILTER (WHERE event_type = 'error') AS failed,
              COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchased
            FROM events GROUP BY user_id ORDER BY user_id"""))

  // ---------------------------------------------------------------- B6
  // Reference: ORDER BY execution_date DESC LIMIT 50 (grafana msconvert.json:101)
  // — TakeOrderedAndProject, no full sort at scale.
  private val b06 = GQuery(
    "b06_topk_recent", "B6 A8",
    (s, dir) =>
      events(s, dir)
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(50),
    Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
            FROM events ORDER BY ts DESC, event_id DESC LIMIT 50"""))

  // ---------------------------------------------------------------- B7
  // Reference: 4-relation equi-join (grafana msconvert.json:142) — here the
  // star-schema form: lineitem⋈orders⋈customer⋈nation⋈region with the small
  // dims broadcast (the 100 TB plan: one shuffle join on l_orderkey, dims all
  // broadcast; region/nation are KBs, customer at TPC-H scale is bucketable).
  private val b07 = GQuery(
    "b07_multijoin_revenue", "B7",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders").where(col("o_orderstatus") === "F")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(
          sum(dec2(col("l_extendedprice")) * (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2)))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("region", "nation")
    },
    Some("""SELECT r.r_name AS region, n.n_name AS nation,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
              COUNT(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE o.o_orderstatus = 'F'
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- B8
  // Reference: XCom bytea → UTF-8 → jsonb extraction (grafana msconvert.json:142).
  private val b08 = GQuery(
    "b08_json_extract", "B8",
    (s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id"),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events ORDER BY event_id"""))

  // ---------------------------------------------------------------- B9
  // Reference: path concat `x_outdir.path || '/' || x_outfile.path`
  // (grafana msconvert.json:142).
  private val b09 = GQuery(
    "b09_concat_path", "B9",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws("/", col("source"), concat(col("lang"), lit(".txt"))).as("output_path"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, source || '/' || lang || '.txt' AS output_path
            FROM documents ORDER BY doc_id"""))

  // ---------------------------------------------------------------- B10/B11
  // Reference: verify_batch state counting (dags/msconvert_dag.py:457-460).
  private val b10 = GQuery(
    "b10_status_counts", "B10 B11",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("total"),
          count_if(col("event_type") === "error").as("failed"),
          count_if(col("event_type") === "signup").as("skipped"))
        .withColumn("succeeded", col("total") - col("failed") - col("skipped"))
        .orderBy("user_id"),
    Some("""SELECT user_id, COUNT(*) AS total,
              COUNT(*) FILTER (WHERE event_type = 'error') AS failed,
              COUNT(*) FILTER (WHERE event_type = 'signup') AS skipped,
              COUNT(*) - COUNT(*) FILTER (WHERE event_type = 'error')
                       - COUNT(*) FILTER (WHERE event_type = 'signup') AS succeeded
            FROM events GROUP BY user_id ORDER BY user_id"""))

  // Reference: the whole verify gate — `threshold = min(FAIL_THRESHOLD, total)`,
  // batch fails if failed == total or failed > threshold
  // (dags/msconvert_dag.py:461-474). Skips are excluded from the failure count.
  private val b11 = GQuery(
    "b11_verify_gate", "A16 B10 B11",
    (s, dir) =>
      events(s, dir)
        .agg(
          count(lit(1)).as("total"),
          count_if(col("event_type") === "error").as("failed"),
          count_if(col("event_type") === "signup").as("skipped"))
        .select(
          col("total"), col("failed"), col("skipped"),
          (col("total") - col("failed") - col("skipped")).as("succeeded"),
          least(lit(10L), col("total")).as("threshold"),
          (col("failed") === col("total") ||
            col("failed") > least(lit(10L), col("total"))).as("batch_failed")),
    Some("""SELECT total, failed, skipped, total - failed - skipped AS succeeded,
              LEAST(CAST(10 AS BIGINT), total) AS threshold,
              (failed = total OR failed > LEAST(CAST(10 AS BIGINT), total)) AS batch_failed
            FROM (SELECT COUNT(*) AS total,
                    COUNT(*) FILTER (WHERE event_type = 'error') AS failed,
                    COUNT(*) FILTER (WHERE event_type = 'signup') AS skipped
                  FROM events)"""))

  // ================================================================ §2.C sweep

  // A6 as semi/anti joins: the dedup anti-join is the reference's idempotency
  // core (dags/msconvert_dag.py:112-122) — pending runs minus converted ledger.
  private val c01 = GQuery(
    "c01_semi_join", "A6",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""))

  private val c02 = GQuery(
    "c02_anti_join_dedup", "A6",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""))

  // "Latest archive per base" analog (replace-policy glob, msconvert_dag.py:391-393):
  // latest order per customer via ranking window.
  private val c03 = GQuery(
    "c03_window_latest_per_key", "A15-analog window",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"), col("o_totalprice"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
            WHERE rn = 1 ORDER BY o_custkey"""))

  private val c04 = GQuery(
    "c04_distinct_pairs", "distinct",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2"""))

  // Analytic frame: running total — double additions happen in identical
  // (window-order) sequence in both engines, so exact match is safe.
  private val c05 = GQuery(
    "c05_running_total", "window-frames",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },
    // decimal accumulation: DuckDB's windowed SUM uses segment trees, so a
    // double running sum would differ in association order.
    Some("""SELECT o_custkey, o_orderkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  private val c06 = GQuery(
    "c06_union", "set-ops",
    (s, dir) => {
      val a = Tables(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val b = Tables(s, dir, "orders").where(col("o_orderstatus") === "P")
        .select(col("o_custkey").as("c_custkey"))
      a.union(b).distinct().orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
            ORDER BY c_custkey"""))

  private val c07 = GQuery(
    "c07_intersect", "set-ops",
    (s, dir) => {
      val a = Tables(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val b = Tables(s, dir, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey"))
      a.intersect(b).orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
            ORDER BY c_custkey"""))

  private val c08 = GQuery(
    "c08_except", "set-ops",
    (s, dir) => {
      val a = Tables(s, dir, "customer").select(col("c_custkey"))
      val b = Tables(s, dir, "orders").where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey"))
      a.except(b).orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM customer
            EXCEPT SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
            ORDER BY c_custkey"""))

  private val c09 = GQuery(
    "c09_rollup_agg", "grouping-sets",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  private val c10 = GQuery(
    "c10_cube_agg", "grouping-sets",
    (s, dir) =>
      Tables(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
    Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  // String scalar battery (suffix strip :208, concat :127, LIKE glob :120).
  private val c11 = GQuery(
    "c11_string_battery", "string-fns A5",
    (s, dir) =>
      Tables(s, dir, "part")
        .where(col("p_name").like("%a%"))
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 5).as("name5"),
          regexp_replace(col("p_type"), " ", "_").as("type_u"),
          length(col("p_name")).cast("long").as("name_len"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("bt"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, UPPER(p_brand) AS brand_u, SUBSTRING(p_name, 1, 5) AS name5,
              REPLACE(p_type, ' ', '_') AS type_u, CAST(LENGTH(p_name) AS BIGINT) AS name_len,
              p_brand || ':' || p_type AS bt
            FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey"""))

  // Date/time battery (ts_utc :73-74; date_trunc/EXTRACT grafana :20,48,77).
  private val c12 = GQuery(
    "c12_date_battery", "date-fns",
    (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(
          count(lit(1)).as("n"),
          min(col("o_orderdate").cast("timestamp")).as("first_order"),
          max(col("o_orderdate").cast("timestamp")).as("last_order"))
        .withColumn("month_epoch", unix_timestamp(col("month")))
        .withColumn("yr", year(col("month")).cast("long"))
        .orderBy("month"),
    Some("""SELECT month, n, first_order, last_order,
              CAST(EXTRACT(epoch FROM month) AS BIGINT) AS month_epoch,
              CAST(EXTRACT(year FROM month) AS BIGINT) AS yr
            FROM (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
                    COUNT(*) AS n,
                    MIN(CAST(o_orderdate AS TIMESTAMP)) AS first_order,
                    MAX(CAST(o_orderdate AS TIMESTAMP)) AS last_order
                  FROM orders GROUP BY 1)
            ORDER BY month"""))

  // Math battery (ROUND/divide grafana :48; MB + saved-% :400-424).
  private val c13 = GQuery(
    "c13_math_battery", "math-fns",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // exact decimal product — ROUND(x*0.1, 2) would land on .xx5 ties
          (dec2(col("l_extendedprice")) * lit(0.1).cast(DecimalType(3, 1)))
            .cast("double").as("r"),
          abs(col("l_discount") - 0.05).as("a"),
          ceil(col("l_quantity")).as("c"),
          floor(col("l_quantity")).as("f"),
          sqrt(col("l_quantity")).as("s"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
              CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(3,1)) AS DOUBLE) AS r,
              ABS(l_discount - 0.05) AS a, CAST(CEIL(l_quantity) AS BIGINT) AS c,
              CAST(FLOOR(l_quantity) AS BIGINT) AS f, SQRT(l_quantity) AS s
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  // A7+A8: deterministic sorted batch cap (pending.sort()[:MAX_MAP],
  // dags/msconvert_dag.py:212-220).
  private val c14 = GQuery(
    "c14_sorted_limit", "A7 A8",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy("source", "doc_id")
        .limit(100),
    Some("""SELECT doc_id, source, lang FROM documents ORDER BY source, doc_id LIMIT 100"""))

  private val c15 = GQuery(
    "c15_distinct_counts", "distinct-agg",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows")),
    Some("""SELECT COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps,
              COUNT(*) AS n_rows FROM lineitem"""))

  // Composite-key join (the xcom pivot join shape, grafana msconvert.json:142).
  private val c16 = GQuery(
    "c16_composite_key_join", "B7",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val ps = li.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(moneySum(col("l_quantity")).as("total_qty"))
      li.join(ps, Seq("l_partkey", "l_suppkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("total_qty"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey, ps.total_qty
            FROM lineitem l JOIN (
              SELECT l_partkey, l_suppkey,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
              FROM lineitem GROUP BY 1, 2) ps
            ON l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey
            ORDER BY l.l_orderkey, l.l_linenumber"""))

  // Session windows (streaming §2.C: session analog of the reference's
  // quiescence grouping) — Spark-native session_window, oracle via
  // gaps-and-islands SQL.
  private val c17 = GQuery(
    "c17_sessionization", "streaming-windows",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"))
        .orderBy("user_id", "session_start"),
    Some("""WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
            flagged AS (
              SELECT user_id, ts,
                CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) <= INTERVAL 30 MINUTES
                     THEN 0 ELSE 1 END AS new_s
              FROM t),
            sess AS (
              SELECT user_id, ts,
                SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM flagged)
            SELECT user_id, MIN(ts) AS session_start,
              MAX(ts) + INTERVAL 30 MINUTES AS session_end, COUNT(*) AS n_events
            FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start"""))

  val queries: Seq[GQuery] = Seq(
    b01, b02, b03, b04, b05, b05b, b06, b07, b08, b09, b10, b11,
    c01, c02, c03, c04, c05, c06, c07, c08, c09, c10, c11, c12, c13,
    c14, c15, c16, c17)
}
