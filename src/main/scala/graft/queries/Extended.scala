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

  val queries: Seq[GQuery] = Seq(c18, c19, c20, c21, c22, c23, c24)
}
