package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, StructField, StructType}

/** Coverage beyond the reference's literal SQL surface: the §2.C rows the
  * engine ships via Spark built-ins that deserve first-class verified
  * queries — pivot (the xcom key-pivot shape of grafana msconvert.json:142),
  * range/non-equi join, as-of join, sketch aggregates, JSON-to-struct
  * access.
  */
object Extended {

  private def events(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  // The xcom pivot, literally: Airflow scatters task payloads over a
  // key/value table; the dashboards re-pivot by key (msconvert.json:142).
  // Here: event counts pivoted by type into columns.
  private val c18 = GQuery(
    "c18_pivot", "B7-pivot",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id"),
    Some("""SELECT user_id,
              COUNT(*) FILTER (WHERE event_type = 'click') AS click,
              COUNT(*) FILTER (WHERE event_type = 'error') AS error,
              COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
              COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
              COUNT(*) FILTER (WHERE event_type = 'view') AS view
            FROM events GROUP BY user_id ORDER BY user_id"""))

  // Range (non-equi) join: orders banded into price tiers. Small tier dim is
  // broadcast — a BroadcastNestedLoopJoin on the range predicate, the right
  // plan when one side is tiny; at scale with two big sides this becomes a
  // bucketed band join on a derived equi key (tier id).
  private val c19 = GQuery(
    "c19_range_join", "theta-join",
    (s, dir) => {
      import s.implicits._
      val tiers = Seq(
        ("low", 0.0, 50000.0),
        ("mid", 50000.0, 150000.0),
        ("high", 150000.0, 300000.0),
        ("top", 300000.0, 1e9)).toDF("tier", "lo", "hi")
      Tables(s, dir, "orders")
        .join(broadcast(tiers),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
        .orderBy("tier")
    },
    Some("""SELECT t.tier, COUNT(*) AS n,
              CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM orders o
            JOIN (VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
                         ('high', 150000.0, 300000.0), ('top', 300000.0, 1e9))
                 AS t(tier, lo, hi)
              ON o.o_totalprice >= t.lo AND o.o_totalprice < t.hi
            GROUP BY t.tier ORDER BY t.tier"""))

  // As-of join: each purchase paired with the user's most recent prior (or
  // simultaneous) signup. Implemented the scale-correct way — union the two
  // streams, one window pass per user ordered by time, last_value(ignore
  // nulls) — a single shuffle, no range-join pair explosion. Oracle: DuckDB's
  // native ASOF JOIN.
  private val c20 = GQuery(
    "c20_asof_join", "asof-join",
    (s, dir) => {
      val e = events(s, dir)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), lit(null).cast("timestamp").as("signup_ts"))
      val signups = e.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"), col("ts").as("signup_ts"))
      // at equal ts the signup row must sort before the purchase row so a
      // simultaneous signup is visible (ASOF >= semantics): non-null
      // signup_ts first = nulls last
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("signup_ts").asc_nulls_last)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      purchases.unionByName(signups)
        .withColumn("asof_signup", last(col("signup_ts"), ignoreNulls = true).over(w))
        .where(col("event_id").isNotNull)
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp").as("purchase_ts"),
          col("asof_signup").cast("timestamp").as("asof_signup"))
        .orderBy("event_id")
    },
    // ts cast to microsecond TIMESTAMP inside the subqueries so tie-breaking
    // matches Spark's microsecond TimestampType (parquet stores nanos)
    Some("""SELECT p.event_id, p.user_id,
              p.ts AS purchase_ts, sg.ts AS asof_signup
            FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                  FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                  FROM events WHERE event_type = 'signup') sg
              ON p.user_id = sg.user_id AND p.ts >= sg.ts
            ORDER BY p.event_id"""))

  // HLL++ sketch distinct — the approximate-aggregate row of §2.C. Estimates
  // differ per implementation, so there is no cross-engine oracle; the spec
  // asserts <5% error vs exact. Deterministic in Spark regardless of
  // partitioning (sketch inserts commute, merges associate).
  private val c21 = GQuery(
    "c21_approx_distinct", "sketch-agg",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey")).as("approx_supps")),
    None) // estimator-specific: spec asserts error bound vs exact

  // JSON → typed struct access (B8 extended): parse once with from_json,
  // then field access — the plan-friendly alternative to repeated
  // get_json_object string parses.
  private val c22 = GQuery(
    "c22_json_struct", "B8 json-struct",
    (s, dir) =>
      events(s, dir)
        .withColumn("p", from_json(col("props"),
          StructType(Seq(StructField("k", IntegerType)))))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("p.k")).cast("long").as("sum_k"),
          min(col("p.k")).cast("long").as("min_k"),
          max(col("p.k")).cast("long").as("max_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS n,
              CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
              CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS min_k,
              CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS max_k
            FROM events GROUP BY event_type ORDER BY event_type"""))

  // Sliding window (1 h window, 30 min slide): each event lands in exactly
  // two windows — §2.C streaming-windows, batch flavor (the same window()
  // expression drives the streaming version). Oracle: every event assigned to
  // the two 30-min-aligned window starts covering it.
  private val c23 = GQuery(
    "c23_sliding_window", "streaming-windows",
    (s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("wstart"), col("w.end").as("wend"), col("n"))
        .orderBy("wstart"),
    Some("""WITH g AS (
              SELECT to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) * 1800) AS w0
              FROM events),
            w AS (SELECT w0 AS wstart FROM g
                  UNION ALL
                  SELECT w0 - INTERVAL 30 MINUTES FROM g)
            SELECT CAST(wstart AS TIMESTAMP) AS wstart,
              CAST(wstart + INTERVAL 1 HOUR AS TIMESTAMP) AS wend, COUNT(*) AS n
            FROM w GROUP BY 1, 2 ORDER BY 1"""))

  // Exact interpolated percentiles (median/p90/p99) per group — the duration
  // distribution an ops dashboard needs beyond B3's average. Spark
  // `percentile` and DuckDB `quantile_cont` share the linear-interpolation
  // definition, so results match exactly on the same doubles.
  private val c24 = GQuery(
    "c24_percentiles", "percentile-agg",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          expr("percentile(value, 0.99)").as("p99"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
              quantile_cont(value, 0.5) AS p50,
              quantile_cont(value, 0.9) AS p90,
              quantile_cont(value, 0.99) AS p99
            FROM events GROUP BY event_type ORDER BY event_type"""))

  // Full outer join with coalesced keys: customers with no orders and order
  // keys with no customer both survive — the join-type row §2.B lacks.
  private val c25 = GQuery(
    "c25_full_outer_join", "outer-join",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_name"))
      val o = Tables(s, dir, "orders")
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n_orders"))
      c.join(o, Seq("k"), "full_outer")
        .select(col("k"), col("c_name"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("k")
    },
    Some("""SELECT COALESCE(c.c_custkey, o.o_custkey) AS k, c.c_name,
              COALESCE(o.n_orders, 0) AS n_orders
            FROM customer c
            FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders
                             FROM orders GROUP BY o_custkey) o
              ON c.c_custkey = o.o_custkey
            ORDER BY k"""))

  // Analytic-function battery: lag/lead/rank/dense_rank/ntile over a
  // deterministic per-customer order timeline.
  private val c26 = GQuery(
    "c26_analytic_battery", "window-analytic",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
              LAG(o_totalprice, 1) OVER w AS prev_price,
              LEAD(o_totalprice, 1) OVER w AS next_price,
              RANK() OVER w AS rnk,
              DENSE_RANK() OVER w AS drnk,
              CAST(NTILE(4) OVER w AS INT) AS quartile
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey"""))

  // Array-function battery over the embedding vectors (§2.C "Array fns" —
  // the north-star embeddings make them load-bearing). All folds are
  // left-to-right in double in both engines, so doubles match exactly.
  private val c27 = GQuery(
    "c27_array_battery", "array-fns",
    (s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          expr("CAST(element_at(embedding, 1) AS double)").as("h1"),
          expr("CAST(element_at(embedding, 2) AS double)").as("h2"),
          expr("CAST(element_at(embedding, 3) AS double)").as("h3"),
          expr("CAST(array_max(embedding) AS double)").as("mx"),
          expr("CAST(array_min(embedding) AS double)").as("mn"),
          expr("aggregate(embedding, CAST(0.0 AS double), (a, x) -> a + CAST(x AS double))").as("s"),
          expr("CAST(size(embedding) AS long)").as("dim2"))
        .orderBy("vec_id"),
    Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
              CAST(embedding[1] AS DOUBLE) AS h1,
              CAST(embedding[2] AS DOUBLE) AS h2,
              CAST(embedding[3] AS DOUBLE) AS h3,
              CAST(list_max(embedding) AS DOUBLE) AS mx,
              CAST(list_min(embedding) AS DOUBLE) AS mn,
              list_sum(CAST(embedding AS DOUBLE[])) AS s,
              CAST(len(embedding) AS BIGINT) AS dim2
            FROM embeddings ORDER BY vec_id"""))

  // Conditional-expression battery: CASE tiers, NULLIF/COALESCE, LEAST/
  // GREATEST over orders.
  private val c28 = GQuery(
    "c28_conditional_battery", "conditional-fns",
    (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium")
            .otherwise("large").as("tier"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_x"),
          least(col("o_totalprice"), lit(100000.0)).as("capped"),
          greatest(col("o_totalprice"), lit(50000.0)).as("floored"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
              CASE WHEN o_totalprice < 50000 THEN 'small'
                   WHEN o_totalprice < 200000 THEN 'medium'
                   ELSE 'large' END AS tier,
              COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_x,
              LEAST(o_totalprice, 100000.0) AS capped,
              GREATEST(o_totalprice, 50000.0) AS floored
            FROM orders ORDER BY o_orderkey"""))

  // Map-function battery: build a real MapType column per customer
  // (status → order count) with map_from_entries, then exercise the map
  // surface — cardinality, map_keys, element_at with a missing-key default.
  // Entries are sorted before map construction so key order (and the DuckDB
  // comparison) is deterministic.
  private val c29 = GQuery(
    "c29_map_battery", "map-fns",
    (s, dir) => {
      val per = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("c"))
      per.groupBy(col("o_custkey"))
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("o_orderstatus").as("k"), col("c").as("v"))))).as("mp"))
        .select(col("o_custkey").as("custkey"),
          size(map_keys(col("mp"))).cast("long").as("n_statuses"),
          array_join(map_keys(col("mp")), ",").as("statuses"),
          coalesce(element_at(col("mp"), lit("F")), lit(0L)).as("f_orders"),
          coalesce(element_at(col("mp"), lit("O")), lit(0L)).as("o_orders"))
        .orderBy("custkey")
    },
    Some("""WITH per AS (
              SELECT o_custkey, o_orderstatus AS s, COUNT(*) AS c
              FROM orders GROUP BY 1, 2),
            m AS (
              SELECT o_custkey,
                map_from_entries(list(struct_pack(k := s, v := c) ORDER BY s)) AS mp
              FROM per GROUP BY o_custkey)
            SELECT o_custkey AS custkey,
              CAST(cardinality(mp) AS BIGINT) AS n_statuses,
              array_to_string(map_keys(mp), ',') AS statuses,
              COALESCE(mp['F'][1], 0) AS f_orders,
              COALESCE(mp['O'][1], 0) AS o_orders
            FROM m ORDER BY custkey"""))

  // Sketch-based percentiles — the 100 TB path next to c24's exact form:
  // percentile_approx builds a bounded-memory KLL-style sketch with map-side
  // partial merge (one pass, no per-group sort), where exact percentiles
  // materialize every group's values. Rank error <= 1/accuracy of the value
  // count; the spec pins the approximation against c24's exact answers.
  private val c30 = GQuery(
    "c30_approx_percentiles", "percentiles-approx",
    (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          percentile_approx(col("o_totalprice"), array(lit(0.5), lit(0.9), lit(0.99)),
            lit(10000)).as("pcts"),
          count(lit(1)).as("n"))
        .select(col("o_orderpriority"),
          col("pcts")(0).as("p50"), col("pcts")(1).as("p90"), col("pcts")(2).as("p99"),
          col("n"))
        .orderBy("o_orderpriority"),
    None) // sketch-based: no DuckDB-equivalent bitwise oracle; spec-gated

  // Higher-order-function battery: the user-facing lambda surface
  // (transform/filter/exists/forall) over array columns, oracle-matched to
  // DuckDB's list_* lambdas. These are interpreted in Spark — fine for the
  // functional API surface; the engine's own hot kernels use the native
  // expressions in graft.functions instead (see VectorExpressions).
  // Derived outputs are integer/boolean so the comparison is exact.
  private val c31 = GQuery(
    "c31_higher_order_battery", "array-lambda-fns",
    (s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          size(filter(transform(col("embedding"), x => x.cast("double") * 2),
            y => y > 0.5)).cast("long").as("n_doubled"),
          size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"),
          forall(col("embedding"), x => abs(x) < 1e6).as("all_finite"),
          exists(col("embedding"), x => x > 0.25).as("any_big"))
        .orderBy("vec_id"),
    Some("""SELECT vec_id,
              CAST(len(list_filter(list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2),
                y -> y > 0.5)) AS BIGINT) AS n_doubled,
              CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
              len(list_filter(embedding, x -> abs(x) < 1e6)) = len(embedding) AS all_finite,
              len(list_filter(embedding, x -> x > 0.25)) > 0 AS any_big
            FROM embeddings ORDER BY vec_id"""))

  // Null-semantics battery: SQL's three-valued logic made explicit —
  // null group keys, count(*) vs count(col), null-safe equality (<=>),
  // and NULLS FIRST ordering. Nulls are derived via NULLIF since the
  // fixtures are fully populated.
  private val c32 = GQuery(
    "c32_null_semantics", "null-handling conditional-fns",
    (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("st"),
          col("o_totalprice"))
        .groupBy(col("st"))
        .agg(
          count(lit(1)).as("n_all"),
          count(col("st")).as("n_nonnull"),
          count_if(col("st") <=> lit("F")).as("n_f_nullsafe"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
        .orderBy(col("st").asc_nulls_first),
    Some("""SELECT NULLIF(o_orderstatus, 'O') AS st,
              COUNT(*) AS n_all,
              COUNT(NULLIF(o_orderstatus, 'O')) AS n_nonnull,
              COUNT(*) FILTER (WHERE NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F')
                AS n_f_nullsafe,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM orders
            GROUP BY NULLIF(o_orderstatus, 'O')
            ORDER BY st NULLS FIRST"""))

  // The custom GroupedTopK operator (logical node + strategy + partial/final
  // physical plans, graft.plans) as an oracle-verified query: top-3 most
  // recent orders per customer. Identical semantics to the window
  // row_number form — the oracle — with <= k rows per key per input
  // partition crossing the shuffle and no partition sorts (vs the native
  // WindowGroupLimit path's sort → partial limit → exchange → sort →
  // window; see GroupedTopK scaladoc for the honest comparison).
  private val c33 = GQuery(
    "c33_grouped_topk_custom", "custom-operator topk-per-key",
    (s, dir) => {
      import graft.plans.GroupedTopKOps
      GroupedTopKOps.ensureInstalled(s)
      GroupedTopKOps.groupedTopK(
        Tables(s, dir, "orders"),
        keyCols = Seq(col("o_custkey")),
        orderCols = Seq(col("o_orderdate").desc, col("o_orderkey").desc),
        k = 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders) WHERE rn <= 3
            ORDER BY o_custkey, o_orderkey"""))

  // Time-series gap filling with forward fill: densify the hourly series to
  // the full grid (every hour × every event type), then carry the last
  // observed value across gaps — the monitoring-dashboard densification the
  // reference's Grafana panels get from their charting layer, done in the
  // engine. Hourly sums use the exact-decimal pattern (b03) so the carried
  // values hash-match.
  //
  // Scale shape: the grid is hours × types (tiny — a year is 8.8k rows per
  // type) built from one global min/max agg and broadcast into the left
  // join; actuals partial-aggregate before their (type, hour) shuffle; the
  // forward fill is one window per type, parallel across types. For very
  // long single series, range-partition by (type, time-bucket) and carry
  // the per-bucket tail forward — the same chunked-carry seam as
  // DebounceStream documents.
  private val c34 = GQuery(
    "c34_gap_fill", "window-forward-fill time-series",
    (s, dir) => {
      val actual = events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).cast("double").as("v"))
      val bounds = actual.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      val grid = actual.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      grid.join(actual, Seq("event_type", "hour"), "left")
        .select(col("event_type"), col("hour"), col("v").isNull.as("is_gap"),
          last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
        .orderBy("event_type", "hour")
    },
    Some("""WITH actual AS (
              SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
              FROM events GROUP BY 1, 2),
            bounds AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM actual),
            grid AS (
              SELECT t.event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
              FROM (SELECT DISTINCT event_type FROM actual) t, bounds)
            SELECT g.event_type, g.hour,
              a.v IS NULL AS is_gap,
              last_value(a.v IGNORE NULLS) OVER (
                PARTITION BY g.event_type ORDER BY g.hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
            FROM grid g LEFT JOIN actual a
              ON a.event_type = g.event_type AND a.hour = g.hour
            ORDER BY g.event_type, g.hour"""))

  // Regexp battery: capture-group extraction, match counting, regex
  // filtering — kept to the dialect subset Java regex and DuckDB's RE2
  // share (no backreferences: Spark spells them $1, RE2 \1). Narrow
  // projection, scan-bound at scale like every scalar battery.
  private val c35 = GQuery(
    "c35_regexp_battery", "regexp-fns A5 B8",
    (s, dir) =>
      Tables(s, dir, "part")
        .where(col("p_name").rlike("^[a-f]"))
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 1).as("word1"),
          regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("word2"),
          size(expr("regexp_extract_all(p_name, '[aeiou]+', 0)"))
            .cast("long").as("n_vowel_runs"),
          col("p_type").rlike("^(PROMO|STANDARD)$").as("is_common_type"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
              regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) AS word1,
              regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS word2,
              CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
              regexp_matches(p_type, '^(PROMO|STANDARD)$') AS is_common_type
            FROM part
            WHERE regexp_matches(p_name, '^[a-f]')
            ORDER BY p_partkey"""))

  // Calendar-arithmetic battery: day/month offsets, day difference vs an
  // epoch, month-end snapping, quarter and day-of-week extraction. Date
  // results are cast to timestamp on both sides (the c12 convention) so the
  // driver compares one temporal type. Spark's dayofweek is 1-based
  // Sun..Sat; DuckDB's is 0-based — the oracle shifts by one.
  private val c36 = GQuery(
    "c36_calendar_battery", "date-fns interval-arith",
    (s, dir) =>
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          date_add(to_date(col("o_orderdate")), 30).cast("timestamp").as("plus30d"),
          add_months(to_date(col("o_orderdate")), 2).cast("timestamp").as("plus2m"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since_epoch"),
          last_day(to_date(col("o_orderdate"))).cast("timestamp").as("month_end"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
              CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30d,
              CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS TIMESTAMP) AS plus2m,
              CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch,
              CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
              CAST(quarter(o_orderdate) AS BIGINT) AS q,
              CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow
            FROM orders ORDER BY o_orderkey"""))

  // Unpivot (melt) battery — the inverse of c18's pivot: four lineitem
  // measure columns rotate into (metric, value) rows. Spark's native
  // unpivot and DuckDB's UNPIVOT must agree on row multiplication and
  // column naming. Narrow 4→2 projection with a 4× row fan-out, no
  // shuffle until the final sort.
  private val c37 = GQuery(
    "c37_unpivot_battery", "unpivot-melt C18-inverse",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          variableColumnName = "metric",
          valueColumnName = "v")
        .orderBy("l_orderkey", "l_linenumber", "metric"),
    Some("""SELECT l_orderkey, l_linenumber, metric, v
            FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                    l_discount, l_tax
                  FROM lineitem WHERE l_orderkey <= 100)
            UNPIVOT (v FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
            ORDER BY l_orderkey, l_linenumber, metric"""))

  /** Declarative data-quality rule evaluation — the Deequ /
    * Great-Expectations "checks" surface next to x107's profile: a fixed
    * rule table (id, predicate) evaluates in ONE fact scan as conditional
    * sums (no per-rule pass over the data — the rules fold into a single
    * projection), reporting per rule the violation count, row count and
    * pass rate in thousandths. Rules cover the assertion families a
    * warehouse gate actually runs: non-negativity, value-range, domain
    * membership, temporal sanity, and cross-field consistency.
    */
  def dqRules(li: DataFrame): DataFrame = {
    val rules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "quantity_positive" -> (col("l_quantity") <= 0),
      "price_range" -> (col("l_extendedprice") < 900 || col("l_extendedprice") > 105000),
      "discount_bounds" -> (col("l_discount") < 0 || col("l_discount") > 0.1),
      "tax_bounds" -> (col("l_tax") < 0 || col("l_tax") > 0.08),
      "returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R"),
      "linestatus_domain" -> !col("l_linestatus").isin("F", "O"),
      "shipdate_sane" -> (col("l_shipdate") < to_timestamp(lit("1992-01-01")) ||
        col("l_shipdate") >= to_timestamp(lit("1999-01-01"))),
      "keys_positive" -> (col("l_orderkey") <= 0 || col("l_partkey") <= 0 ||
        col("l_suppkey") <= 0))
    val agg = li.agg(count(lit(1)).as("n_rows"),
      rules.map { case (id, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"v_$id")
      }: _*)
    rules.map { case (id, _) =>
      agg.select(lit(id).as("rule"), col(s"v_$id").as("violations"),
        col("n_rows"),
        expr(s"(1000 * (n_rows - v_$id)) div n_rows").as("pass_milli"))
    }.reduce(_ unionAll _)
      .orderBy("rule")
  }

  private val x136 = GQuery(
    "x136_dq_rules", "ext-pipeline data-quality rule-checks",
    (s, dir) => dqRules(Tables(s, dir, "lineitem")),
    Some("""WITH a AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_quantity_positive,
                CAST(SUM(CASE WHEN l_extendedprice < 900 OR l_extendedprice > 105000 THEN 1 ELSE 0 END) AS BIGINT) AS v_price_range,
                CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v_discount_bounds,
                CAST(SUM(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS v_tax_bounds,
                CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT) AS v_returnflag_domain,
                CAST(SUM(CASE WHEN l_linestatus NOT IN ('F', 'O') THEN 1 ELSE 0 END) AS BIGINT) AS v_linestatus_domain,
                CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01' OR l_shipdate >= TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS v_shipdate_sane,
                CAST(SUM(CASE WHEN l_orderkey <= 0 OR l_partkey <= 0 OR l_suppkey <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_keys_positive
              FROM lineitem)
            SELECT rule, violations, n_rows,
              (1000 * (n_rows - violations)) // n_rows AS pass_milli
            FROM (
              SELECT 'quantity_positive' AS rule, v_quantity_positive AS violations, n_rows FROM a
              UNION ALL SELECT 'price_range', v_price_range, n_rows FROM a
              UNION ALL SELECT 'discount_bounds', v_discount_bounds, n_rows FROM a
              UNION ALL SELECT 'tax_bounds', v_tax_bounds, n_rows FROM a
              UNION ALL SELECT 'returnflag_domain', v_returnflag_domain, n_rows FROM a
              UNION ALL SELECT 'linestatus_domain', v_linestatus_domain, n_rows FROM a
              UNION ALL SELECT 'shipdate_sane', v_shipdate_sane, n_rows FROM a
              UNION ALL SELECT 'keys_positive', v_keys_positive, n_rows FROM a)
            ORDER BY rule"""))

  // ------------------------------------------------------------------- x196
  // Large-large BAND join (|a.cents − b.cents| <= delta, same day) via the
  // bucket rewrite — the reconciliation join (two ledgers, near-equal
  // amounts) where BOTH sides are fact-sized, so c19's broadcast trick
  // does not apply and Spark's planner would fall back to a nested-loop
  // pair explosion. The rewrite: bucket = cents div (delta+1), the left
  // side emits buckets {b−1, b, b+1}, the right side emits b, and the
  // join becomes a pure EQUI-join on (day, bucket) with the band
  // predicate as a residual filter — width delta+1 and FLOOR division
  // (sign-safe, unlike truncation) guarantee any pair within the band
  // differs by at most one bucket, and a matching pair
  // meets on EXACTLY one bucket value (the right row's own), so no
  // dedup pass is needed. PlanAuditSpec's machinery gates the shape:
  // the lint must find no cartesian in this plan.
  //
  // Scale shape: two fact-sized shuffles on (day, bucket) and a
  // per-bucket hash join — candidate fan-out is bounded by per-bucket
  // density, never |L|x|R|; skew concentrates only if the VALUE
  // distribution does, the same bound as any equi-join.
  private val BandDelta = 5L

  private val x196 = GQuery(
    "x196_band_join", "ext-join band-join bucket-rewrite",
    (s, dir) => {
      val e = events(s, dir)
        .select(to_date(col("ts")).as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          col("event_id"))
      val width = BandDelta + 1
      val left = e.where(pmod(col("event_id"), lit(2)) === 0)
        .select(col("day"), col("cents").as("l_cents"),
          explode(array((-1 to 1).map(d =>
            floor(col("cents") / width).cast("long") + d): _*)).as("bucket"))
      val right = e.where(pmod(col("event_id"), lit(2)) === 1)
        .select(col("day"), col("cents").as("r_cents"),
          floor(col("cents") / width).cast("long").as("bucket"))
      left.join(right, Seq("day", "bucket"))
        .where(abs(col("l_cents") - col("r_cents")) <= BandDelta)
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(abs(col("l_cents") - col("r_cents"))).as("sum_absdiff"),
          min(col("l_cents") - col("r_cents")).as("min_diff"),
          max(col("l_cents") - col("r_cents")).as("max_diff"))
        .orderBy("day")
    },
    Some("""WITH e AS (
              SELECT CAST(ts AS DATE) AS day,
                CAST(round(value * 100, 0) AS BIGINT) AS cents, event_id
              FROM events),
            l AS (SELECT * FROM e WHERE event_id % 2 = 0),
            r AS (SELECT * FROM e WHERE event_id % 2 = 1)
            SELECT l.day, CAST(COUNT(*) AS BIGINT) AS n_pairs,
              CAST(SUM(ABS(l.cents - r.cents)) AS BIGINT) AS sum_absdiff,
              MIN(l.cents - r.cents) AS min_diff,
              MAX(l.cents - r.cents) AS max_diff
            FROM l JOIN r ON l.day = r.day
              AND ABS(l.cents - r.cents) <= 5
            GROUP BY l.day ORDER BY l.day"""))

  // ------------------------------------------------------------------- x210
  // Functional-dependency discovery — the schema-profiling step a
  // normalization / dimensional-modeling pass runs before declaring keys
  // (and the evidence [[graft.plans.JoinElimination]]-style rewrites
  // need): for each candidate A → B over the denormalized
  // customer⋈nation⋈region slice, the exact violation census
  // Σ_a (ndv_B(a) − 1) — zero iff the dependency holds. The candidate
  // list deliberately mixes holding FDs (nationkey → regionkey,
  // nationkey → nation name) with failing ones (mktsegment → nationkey,
  // regionkey → nationkey), so both verdicts are exercised under the
  // hash.
  //
  // Scale shape: ONE scan — candidates stack through a generator (the
  // x200-stats stacking idiom), then one (fd, lhs) aggregate and one
  // fd-grained rollup; no per-candidate re-scan, no countDistinct
  // expand. At profiling scale the exact ndv swaps for the x153 HLL
  // aggregate — same shape.
  private val x210 = GQuery(
    "x210_fd_discovery", "ext-profiling functional-dependency discovery",
    (s, dir) => {
      val denorm = Tables(s, dir, "customer")
        .join(Tables(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .join(Tables(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          col("n_name"), col("n_regionkey"), col("r_name"))
      val cands = Seq(
        ("c_nationkey->n_regionkey", "c_nationkey", "n_regionkey"),
        ("c_nationkey->n_name", "c_nationkey", "n_name"),
        ("n_regionkey->r_name", "n_regionkey", "r_name"),
        ("c_mktsegment->c_nationkey", "c_mktsegment", "c_nationkey"),
        ("n_regionkey->c_nationkey", "n_regionkey", "c_nationkey"),
        ("c_custkey->c_mktsegment", "c_custkey", "c_mktsegment"))
      denorm
        .select(explode(array(cands.map { case (fd, a, b) =>
          struct(lit(fd).as("fd"), col(a).cast("string").as("lhs"),
            col(b).cast("string").as("rhs"))
        }: _*)).as("s"))
        .select(col("s.fd").as("fd"), col("s.lhs").as("lhs"),
          col("s.rhs").as("rhs"))
        .groupBy("fd", "lhs").agg(countDistinct(col("rhs")).as("ndv_rhs"))
        .groupBy("fd")
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("ndv_rhs") > 1, 1L).otherwise(0L)).as("n_violating"),
          sum(col("ndv_rhs") - 1).as("violation_excess"))
        .withColumn("holds", col("violation_excess") === 0L)
        .orderBy("fd")
    },
    Some("""WITH denorm AS (
              SELECT c_custkey, c_nationkey, c_mktsegment,
                n_name, n_regionkey, r_name
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey),
            stacked AS (
              SELECT 'c_nationkey->n_regionkey' AS fd,
                CAST(c_nationkey AS VARCHAR) AS lhs,
                CAST(n_regionkey AS VARCHAR) AS rhs FROM denorm
              UNION ALL SELECT 'c_nationkey->n_name',
                CAST(c_nationkey AS VARCHAR), n_name FROM denorm
              UNION ALL SELECT 'n_regionkey->r_name',
                CAST(n_regionkey AS VARCHAR), r_name FROM denorm
              UNION ALL SELECT 'c_mktsegment->c_nationkey',
                c_mktsegment, CAST(c_nationkey AS VARCHAR) FROM denorm
              UNION ALL SELECT 'n_regionkey->c_nationkey',
                CAST(n_regionkey AS VARCHAR),
                CAST(c_nationkey AS VARCHAR) FROM denorm
              UNION ALL SELECT 'c_custkey->c_mktsegment',
                CAST(c_custkey AS VARCHAR), c_mktsegment FROM denorm),
            perLhs AS (
              SELECT fd, lhs, CAST(COUNT(DISTINCT rhs) AS BIGINT) AS ndv_rhs
              FROM stacked GROUP BY 1, 2)
            SELECT fd, CAST(COUNT(*) AS BIGINT) AS n_groups,
              CAST(SUM(CASE WHEN ndv_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_violating,
              CAST(SUM(ndv_rhs - 1) AS BIGINT) AS violation_excess,
              SUM(ndv_rhs - 1) = 0 AS holds
            FROM perLhs GROUP BY fd ORDER BY fd"""))

  // ------------------------------------------------------------------- x234
  // Sketch-tier quantiles — c24's exact percentiles are the PARITY row;
  // this is the row that actually runs at 100 TB: Spark's native
  // Greenwald–Khanna-style `approx_percentile` (mergeable one-pass
  // summaries, map-side combinable, memory bounded by the accuracy knob
  // instead of the group size). No cross-engine oracle — DuckDB's
  // sketch is a different algorithm — so the gate is ApproxQuantileSpec:
  // the documented rank-error bound against c24's exact values, per
  // group, at the configured accuracy.
  private val x234 = GQuery(
    "x234_approx_quantiles", "percentile-sketch scale-tier",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)")
            .as("q"))
        .select(col("event_type"),
          element_at(col("q"), 1).as("p50"),
          element_at(col("q"), 2).as("p90"),
          element_at(col("q"), 3).as("p99"))
        .orderBy("event_type"),
    None) // sketch-specific values: gated by ApproxQuantileSpec rank error

  // ------------------------------------------------------------------- x278
  // Nearest-rank percentiles per small group — x234's EXACT arm, oracled
  // (the r9 VERDICT conversion item): per (event_type, day), the
  // inverse-CDF percentile (smallest value at rank ceil(q·n), the SQL
  // percentile_disc definition) computed explicitly from integer rank
  // arithmetic — ceil(q·n) as (k·n + d − 1) div d — so both engines pick
  // the IDENTICAL data element (no interpolation, no sketch, no float
  // construction) and the row hash-verifies. This is the tier a
  // daily-SLA report runs when groups are bounded: c24 is the
  // interpolated whole-table parity row, x234 the unbounded-group
  // sketch, this the small-group exact read — the three-tier policy in
  // registry form.
  //
  // Scale shape: one per-group sort window — the documented cost of the
  // exact arm, affordable precisely BECAUSE the (type, day) groups are
  // bounded (the premise of choosing this tier over x234); the rollup is
  // group-domain-sized. Ties need no break for the VALUE at a rank
  // (equal values straddle any boundary identically); event_id makes the
  // row numbering itself deterministic.
  private val x278 = GQuery(
    "x278_percentile_exact_rank", "percentile-exact small-group-tier",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"), date_trunc("day", col("ts")))
        .orderBy(col("value"), col("event_id"))
      events(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(org.apache.spark.sql
          .expressions.Window.partitionBy(col("event_type"),
            date_trunc("day", col("ts")))))
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(
          max(when(col("rn") === expr("(n + 1) div 2"), col("value"))).as("p50"),
          max(when(col("rn") === expr("(9 * n + 9) div 10"), col("value"))).as("p90"),
          max(when(col("rn") === expr("(99 * n + 99) div 100"), col("value"))).as("p99"),
          max(col("n")).as("n_rows"))
        .orderBy("event_type", "day")
    },
    Some("""WITH t AS (
              SELECT event_type,
                CAST(date_trunc('day', ts) AS DATE) AS day, value,
                ROW_NUMBER() OVER (
                  PARTITION BY event_type, date_trunc('day', ts)
                  ORDER BY value, event_id) AS rn,
                CAST(COUNT(*) OVER (
                  PARTITION BY event_type, date_trunc('day', ts))
                  AS BIGINT) AS n
              FROM events)
            SELECT event_type, day,
              MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
              MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90,
              MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99,
              MAX(n) AS n_rows
            FROM t GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ------------------------------------------------------------------- x281
  // Trimmed (5 %) robust mean — the outlier-resistant location estimate a
  // monitoring pipeline reads when tail events (retries, bulk imports,
  // clock skew) poison the plain average: per event_type, drop the
  // n div 20 lowest- and highest-RANKED observations and average the
  // rest. Exact integers end to end: values sum as CENTS (the b03
  // DECIMAL discipline — decimal summation is order-independent where
  // double summation is not), trim bounds from integer rank arithmetic,
  // mean centi-quantized by integer division.
  //
  // Scale shape: the x214/x273 "facts never sort" discipline — one
  // map-side-combinable (type, value)-domain aggregate, then DOMAIN
  // cumsum windows; each distinct value's kept MULTIPLICITY is the
  // interval overlap of its cumulative rank span [c−cnt+1, c] with the
  // kept band [t+1, n−t], so no per-row rank is ever computed and
  // nothing fact-sized sorts. Unlike the x278 percentile row (whose
  // small-group premise bounds its sort), this form holds at any group
  // size.
  private val x281 = GQuery(
    "x281_trimmed_mean", "robust-aggregate trimmed-mean domain-exact",
    (s, dir) => {
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("value"))
      val all = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      events(s, dir)
        .groupBy(col("event_type"), col("value"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cents",
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
        .withColumn("c", sum(col("cnt")).over(wt))
        .withColumn("n", sum(col("cnt")).over(all))
        .withColumn("t", expr("n div 20"))
        .withColumn("kept", expr(
          "greatest(0, least(c, n - t) - greatest(c - cnt + 1, t + 1) + 1)"))
        .where(col("kept") > 0)
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"), max(col("t")).as("n_trimmed_each"),
          sum(col("kept")).as("n_kept"),
          // cents×kept in DECIMAL(38,0): a LONG product wraps silently
          // past 2^63 at the row scales this query is priced for (the
          // x270 headroom discipline; DuckDB mirrors with HUGEINT)
          sum(col("cents").cast(DecimalType(38, 0)) * col("kept"))
            .as("sum_cents"))
        .select(col("event_type"), col("n"), col("n_trimmed_each"),
          col("n_kept"),
          expr("CAST(sum_cents div n_kept AS BIGINT)")
            .as("trimmed_mean_centi"))
        .orderBy("event_type")
    },
    Some("""WITH dom AS (
              SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS cnt,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
              FROM events GROUP BY 1, 2),
            cum AS (
              SELECT event_type, cents, cnt,
                CAST(SUM(cnt) OVER (PARTITION BY event_type
                  ORDER BY value) AS BIGINT) AS c,
                CAST(SUM(cnt) OVER (PARTITION BY event_type)
                  AS BIGINT) AS n
              FROM dom),
            k AS (
              SELECT event_type, cents, n, n // 20 AS t,
                greatest(0, least(c, n - n // 20)
                  - greatest(c - cnt + 1, n // 20 + 1) + 1) AS kept
              FROM cum)
            SELECT event_type, MAX(n) AS n, MAX(t) AS n_trimmed_each,
              CAST(SUM(kept) AS BIGINT) AS n_kept,
              CAST(SUM(CAST(cents AS HUGEINT) * kept) // SUM(kept)
                AS BIGINT) AS trimmed_mean_centi
            FROM k
            WHERE kept > 0
            GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x293
  // Referential-integrity audit — the CROSS-table half of data quality
  // x136's single-table rules stop at: per foreign-key relationship,
  // exact child row count, orphan count (children whose parent key is
  // absent), and coverage millis. Orphans are how partial loads, late
  // dimensions, and botched deletes actually surface; a warehouse runs
  // this table after every load. Each relationship is one LEFT ANTI
  // join on the key — broadcastable when the parent is a dimension,
  // co-partitioned shuffle otherwise; Catalyst picks per stats, which is
  // the point of writing it declaratively.
  private def fkAudit(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val orphans = child.select(col(childKey).as("k"))
      .join(parent.select(col(parentKey).as("k")), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    child.agg(count(lit(1)).as("n_child"))
      .crossJoin(broadcast(orphans))
      .select(lit(name).as("relationship"), col("n_child"), col("n_orphans"),
        expr("(1000 * (n_child - n_orphans)) div n_child")
          .as("coverage_milli"))
  }

  private val x293 = GQuery(
    "x293_referential_audit", "ext-pipeline data-quality referential",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      fkAudit(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionAll(fkAudit(li, "l_partkey", Tables(s, dir, "part"),
          "p_partkey", "lineitem->part"))
        .unionAll(fkAudit(li, "l_suppkey", Tables(s, dir, "supplier"),
          "s_suppkey", "lineitem->supplier"))
        .unionAll(fkAudit(o, "o_custkey", Tables(s, dir, "customer"),
          "c_custkey", "orders->customer"))
        .orderBy("relationship")
    },
    Some("""WITH a AS (
              SELECT 'lineitem->orders' AS relationship,
                CAST(COUNT(*) AS BIGINT) AS n_child,
                CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphans
              FROM lineitem l LEFT JOIN orders o
                ON l.l_orderkey = o.o_orderkey
              UNION ALL
              SELECT 'lineitem->part', COUNT(*),
                SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
              FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
              UNION ALL
              SELECT 'lineitem->supplier', COUNT(*),
                SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
              FROM lineitem l LEFT JOIN supplier s
                ON l.l_suppkey = s.s_suppkey
              UNION ALL
              SELECT 'orders->customer', COUNT(*),
                SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
              FROM orders o LEFT JOIN customer c
                ON o.o_custkey = c.c_custkey)
            SELECT relationship, CAST(n_child AS BIGINT) AS n_child,
              CAST(n_orphans AS BIGINT) AS n_orphans,
              CAST((1000 * (n_child - n_orphans)) // n_child AS BIGINT)
                AS coverage_milli
            FROM a ORDER BY relationship"""))

  // ------------------------------------------------------------------- x298
  // Join-blowup forecast — the EXACT output cardinality of a self-join
  // per candidate key, computed from the key histogram BEFORE any join
  // runs: |A ⋈ A on k| = Σ cnt(k)², with the hottest key's contribution
  // and the blowup factor Σc² div Σc in millis. This is the number that
  // says whether a wedge/co-purchase/all-pairs construction (x05, x123,
  // x145) is affordable on a key, and which key needs salting — x106
  // reports the skew, this prices the join it feeds. Σc² rides
  // DECIMAL(38,0)/HUGEINT (a 10⁶-row hot key contributes 10¹², and 10⁹
  // keys of those pass 2⁶³ — the x270 headroom discipline).
  //
  // Scale shape: one map-side-combinable key histogram per candidate,
  // one domain rollup each, three 1-row summaries unioned.
  private def joinBlowup(t: DataFrame, keyName: String): DataFrame =
    t.select(col(keyName).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("selfjoin_rows"),
        max(col("c")).as("max_key_rows"))
      .select(lit(keyName).as("join_key"), col("n_rows"), col("n_keys"),
        col("selfjoin_rows").cast("decimal(38,0)").as("sj"),
        col("max_key_rows"))
      .select(col("join_key"), col("n_rows"), col("n_keys"),
        col("sj").cast("long").as("selfjoin_rows"), col("max_key_rows"),
        expr("cast((1000 * sj) div n_rows as bigint)").as("blowup_milli"))

  private val x298 = GQuery(
    "x298_join_blowup_forecast", "ext-profiling join-cardinality forecast",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      joinBlowup(li, "l_orderkey")
        .unionAll(joinBlowup(li, "l_partkey"))
        .unionAll(joinBlowup(li, "l_suppkey"))
        .orderBy("join_key")
    },
    Some("""WITH h AS (
              SELECT 'l_orderkey' AS join_key, l_orderkey AS k
              FROM lineitem
              UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
              UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
            c AS (SELECT join_key, k, CAST(COUNT(*) AS BIGINT) AS c
                  FROM h GROUP BY 1, 2)
            SELECT join_key, CAST(SUM(c) AS BIGINT) AS n_rows,
              CAST(COUNT(*) AS BIGINT) AS n_keys,
              CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS selfjoin_rows,
              CAST(MAX(c) AS BIGINT) AS max_key_rows,
              CAST((1000 * SUM(CAST(c AS HUGEINT) * c)) // SUM(c) AS BIGINT)
                AS blowup_milli
            FROM c GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------ x337
  // HyperLogLog register state, ORACLED EXACT TWIN of c21: the sketch
  // itself made cross-engine-reproducible. c21's estimate is
  // implementation-specific (Spark's HLL++ bias tables), so the twin
  // pins the layer below the estimator: with an md5-derived hash, the
  // ENTIRE register array of a p=8 HLL (256 registers; register = first
  // byte of the hash, rank = leading-zero count of the next 52 bits
  // + 1, capped at 53) is deterministic, and DuckDB rebuilds it
  // bit-for-bit. Output: one row with the register-vector digest, the
  // exact scaled harmonic denominator Σ 2^(53−rank_r) (empty registers
  // contribute 2^53 — the float-free integer form of the HLL Z term;
  // any engine can finish α·m²/(Z/2^53) from it), registers hit, and
  // the true distinct count in the same row. Rank extraction is pure
  // string/integer arithmetic on the hex form (leading-'0' run length
  // + a nibble CASE), identical both engines.
  //
  // Scale shape: distinct-project the key (HLL state depends only on
  // the distinct set), one map, one 256-cell register aggregate, one
  // 1-row rollup; the exact count joins as a 1-row broadcast cross.
  private val x337 = GQuery(
    "x337_hll_registers_exact", "sketch-agg oracled-twin",
    (s, dir) => {
      val regs = Tables(s, dir, "lineitem")
        .select(col("l_partkey")).distinct()
        .select(md5(concat(col("l_partkey").cast("string"), lit(":hll"))).as("h"))
        .select(expr("CAST(conv(substring(h, 1, 2), 16, 10) AS INT)").as("r"),
          expr("substring(h, 3, 13)").as("rest"))
        .withColumn("zeros", length(regexp_extract(col("rest"), "^0*", 0)))
        .withColumn("d1", expr("substring(rest, zeros + 1, 1)"))
        .withColumn("rank", expr(
          """CASE WHEN d1 = '' THEN 53
             ELSE 4 * zeros + CASE WHEN d1 = '1' THEN 3
                                   WHEN d1 IN ('2', '3') THEN 2
                                   WHEN d1 IN ('4', '5', '6', '7') THEN 1
                                   ELSE 0 END + 1 END"""))
        .groupBy(col("r")).agg(max(col("rank")).as("mx"))
        .agg(count(lit(1)).as("n_registers_hit"),
          md5(concat_ws(",", expr(
            "transform(array_sort(collect_list(struct(r, mx))), x -> concat(x.r, ':', x.mx))")))
            .as("registers_digest"),
          (sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - mx)"))
            + (lit(256L) - count(lit(1))) * lit(9007199254740992L)).as("z_scaled"))
      val exact = Tables(s, dir, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
      regs.crossJoin(broadcast(exact))
        .select(lit(256L).as("m"), col("n_registers_hit"),
          col("registers_digest"), col("z_scaled"), col("exact_distinct"))
    },
    Some("""WITH h AS (
              SELECT md5(CAST(l_partkey AS VARCHAR) || ':hll') AS h
              FROM (SELECT DISTINCT l_partkey FROM lineitem)),
            f AS (
              SELECT CAST(CAST(CONCAT('0x', substr(h, 1, 2)) AS UBIGINT)
                  AS INTEGER) AS r,
                substr(h, 3, 13) AS rest,
                CAST(length(regexp_extract(substr(h, 3, 13), '^0*'))
                  AS INTEGER) AS zeros
              FROM h),
            rk AS (
              SELECT r,
                CASE WHEN substr(rest, zeros + 1, 1) = '' THEN 53
                     ELSE 4 * zeros
                        + CASE WHEN substr(rest, zeros + 1, 1) = '1' THEN 3
                               WHEN substr(rest, zeros + 1, 1) IN ('2', '3') THEN 2
                               WHEN substr(rest, zeros + 1, 1) IN ('4', '5', '6', '7') THEN 1
                               ELSE 0 END + 1 END AS rank
              FROM f),
            reg AS (SELECT r, MAX(rank) AS mx FROM rk GROUP BY 1),
            st AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_registers_hit,
                md5(string_agg(CAST(r AS VARCHAR) || ':' || CAST(mx AS VARCHAR),
                  ',' ORDER BY r)) AS registers_digest,
                CAST(SUM(CAST(1 AS BIGINT) << (53 - mx))
                  + (256 - COUNT(*)) * 9007199254740992 AS BIGINT) AS z_scaled
              FROM reg)
            SELECT CAST(256 AS BIGINT) AS m, n_registers_hit,
              registers_digest, z_scaled,
              (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
               FROM lineitem) AS exact_distinct
            FROM st"""))

  // ------------------------------------------------------------------- x349
  // KMV / theta distinct sketch, exact state (Bar-Yossef et al. 2002;
  // the K-Minimum-Values form behind Theta sketches) — the second
  // mergeable-cardinality family beside HLL (x337's register twin):
  // per event_type (plus the merged '__all__' arm, demonstrating the
  // union-mergeability that makes KMV the warehouse-rollup sketch), the
  // k=64 smallest 60-bit md5 values of the distinct user set are a
  // DETERMINISTIC state, so the 64th minimum, the (k−1)/θ estimate, and
  // its exact error are all oracle-checkable integers — the sketch
  // accuracy table read before standardizing on a k. Small populations
  // (n < k) fall back to the exact count, the KMV rule.
  //
  // Scale shape: distinct-project → per-type rank window. The window
  // ranks the full distinct (type, user) set — n_exact needs the full
  // count anyway, so no rank-limit filter exists for WindowGroupLimit
  // to exploit (adding `rn <= 64` would silently cap n_exact and break
  // the n < k fallback); a streaming deployment maintains the k minima
  // incrementally instead (SketchMaintainStream pattern). The '__all__'
  // arm is a second pass of the same distinct projection, not a
  // corpus-sized shuffle join. 63·2⁶⁰ rides in DECIMAL(38,0).
  private val x349 = GQuery(
    "x349_kmv_distinct_sketch", "ext-sketch kmv-theta exact-state",
    (s, dir) => {
      val base = events(s, dir).select(col("event_type"), col("user_id"))
      val both = base
        .unionAll(base.select(lit("__all__").as("event_type"), col("user_id")))
        .distinct()
      val hv = both.select(col("event_type"),
        expr("""CAST(conv(substring(md5(concat('k:', cast(user_id as string))),
             1, 15), 16, 10) AS BIGINT)""").as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("v"))
      hv.withColumn("rn", row_number().over(w).cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_exact"),
          max(when(col("rn") === 64L, col("v"))).as("v64"))
        .select(col("event_type"), col("n_exact"),
          lit(64L).as("sketch_k"),
          expr("""cast(case when n_exact < 64 then n_exact
               else (63 * cast(1152921504606846976 as decimal(38,0))) div v64
               end as bigint)""").as("kmv_estimate"))
        .withColumn("err_milli",
          expr("cast((1000 * abs(kmv_estimate - n_exact)) div n_exact as bigint)"))
        .orderBy("event_type")
    },
    Some("""WITH base AS (
              SELECT DISTINCT event_type, user_id FROM events
              UNION
              SELECT DISTINCT '__all__' AS event_type, user_id FROM events),
            hv AS (
              SELECT event_type,
                CAST(CAST(CONCAT('0x', substr(md5('k:' ||
                  CAST(user_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)
                  AS v
              FROM base),
            r AS (
              SELECT event_type, v, CAST(ROW_NUMBER() OVER (
                  PARTITION BY event_type ORDER BY v) AS BIGINT) AS rn
              FROM hv),
            per AS (
              SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact,
                MAX(CASE WHEN rn = 64 THEN v END) AS v64
              FROM r GROUP BY 1),
            est AS (
              SELECT event_type, n_exact, CAST(64 AS BIGINT) AS sketch_k,
                CAST(CASE WHEN n_exact < 64 THEN n_exact
                  ELSE (63 * CAST(1152921504606846976 AS HUGEINT)) // v64
                  END AS BIGINT) AS kmv_estimate
              FROM per)
            SELECT event_type, n_exact, sketch_k, kmv_estimate,
              CAST((1000 * ABS(kmv_estimate - n_exact)) // n_exact AS BIGINT)
                AS err_milli
            FROM est ORDER BY 1"""))

  val queries: Seq[GQuery] = Seq(
    c18, c19, c20, c21, c22, c23, c24, c25, c26, c27, c28, c29, c30, c31, c32,
    c33, c34, c35, c36, c37, x136, x196, x210, x234, x278, x281, x293, x298,
    x337, x349)
}
