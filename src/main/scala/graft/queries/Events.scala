package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond windowed aggregation: ordered-funnel
  * attribution over the `events` table, and the generator-function battery
  * (sequence / stack / posexplode_outer / array_repeat / flatten) that the
  * coverage matrix's "generators" row calls for.
  */
object Events {

  private def events(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  // Ordered funnel: view -> click -> purchase, strictly sequential per user
  // (each stage's event must be LATER than the previous stage's earliest
  // completion — the standard attribution semantics; an earlier click does
  // not count toward a later view). Output: per-user stage timestamps and
  // the funnel depth reached (0-3).
  //
  // Scale shape: ONE scan of events and ONE hash exchange on user_id. The
  // naive relational form (a grouped min per stage, re-joining events three
  // times) scans the fact table once per funnel stage; instead, a running
  // min over the per-user time-sorted stream marks each event's
  // "earliest qualified previous stage so far", which makes qualification a
  // row-local test. The two stacked windows and the final groupBy all share
  // the user_id clustering, so one exchange + one sort serve everything
  // (PlanSpec pins both properties). Strictness is preserved exactly: a
  // click qualifies iff its ts is strictly greater than the minimum view ts
  // among earlier rows, which equals "later than the user's earliest view"
  // whenever that is satisfiable — ties at identical ts fail strict > under
  // either definition.
  private val x49 = GQuery(
    "x49_funnel", "ext-events funnel-attribution",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts").cast("timestamp").as("ts"))
        .withColumn("view_min",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("click_q",
          when(col("event_type") === "click" && col("ts") > col("view_min"), col("ts")))
        .withColumn("click_min", min(col("click_q")).over(w))
        .withColumn("purchase_q",
          when(col("event_type") === "purchase" && col("ts") > col("click_min"), col("ts")))
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(col("click_q")).as("t_click"),
          min(col("purchase_q")).as("t_purchase"))
        .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
          when(col("t_purchase").isNotNull, 3L)
            .when(col("t_click").isNotNull, 2L)
            .when(col("t_view").isNotNull, 1L)
            .otherwise(0L).as("stage"))
        .orderBy("user_id")
    },
    Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
            v AS (SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS t_view
                  FROM events WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, CAST(MIN(e.ts) AS TIMESTAMP) AS t_click
                  FROM events e JOIN v ON e.user_id = v.user_id
                  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id, CAST(MIN(e.ts) AS TIMESTAMP) AS t_purchase
                  FROM events e JOIN c ON e.user_id = c.user_id
                  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
                  GROUP BY e.user_id)
            SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
              CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
                        WHEN c.t_click IS NOT NULL THEN 2
                        WHEN v.t_view IS NOT NULL THEN 1
                        ELSE 0 END AS BIGINT) AS stage
            FROM u LEFT JOIN v ON u.user_id = v.user_id
            LEFT JOIN c ON u.user_id = c.user_id
            LEFT JOIN p ON u.user_id = p.user_id
            ORDER BY u.user_id"""))

  // Generator battery over the nation table: one unioned relation
  // exercising sequence (with an empty-list case), posexplode_outer (the
  // empty list must still emit a null row), stack (constant row expansion),
  // array_repeat, and flatten — each mirrored in the oracle by DuckDB's
  // range/unnest/UNION ALL equivalents. All values are integers, so parity
  // is exact. Generators are narrow per-row expansions: no shuffle except
  // the output sort.
  private val c38 = GQuery(
    "c38_generator_battery", "generators",
    (s, dir) => {
      val n = Tables(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("k"),
          col("n_regionkey").cast("long").as("r"))
      val seqCol = when(pmod(col("k"), lit(5)) === 0, array().cast("array<bigint>"))
        .otherwise(sequence(lit(0L), pmod(col("k"), lit(3))))
      val g1 = n.select(col("k"), lit("seq").as("src"), posexplode_outer(seqCol))
        .select(col("k"), col("src"), col("pos").cast("long").as("pos"),
          col("col").cast("long").as("val"))
      val g2 = n.selectExpr("k", "stack(2, 'nat', k, 'reg', r) AS (name, v)")
        .select(col("k"), concat(lit("stack_"), col("name")).as("src"),
          lit(null).cast("long").as("pos"), col("v").cast("long").as("val"))
      val g3 = n.select(col("k"), lit("rep").as("src"),
          posexplode(array_repeat(col("r"), 2)))
        .select(col("k"), col("src"), col("pos").cast("long").as("pos"),
          col("col").cast("long").as("val"))
      val g4 = n.select(col("k"), lit("flat").as("src"),
          posexplode(flatten(array(
            sequence(lit(1L), lit(2L)),
            sequence(lit(3L), lit(3L) + pmod(col("k"), lit(2)))))))
        .select(col("k"), col("src"), col("pos").cast("long").as("pos"),
          col("col").cast("long").as("val"))
      g1.unionByName(g2).unionByName(g3).unionByName(g4)
        .orderBy("k", "src", "pos", "val")
    },
    Some("""WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS k,
                         CAST(n_regionkey AS BIGINT) AS r FROM nation),
            sq AS (SELECT k, CASE WHEN k % 5 = 0 THEN CAST([] AS BIGINT[])
                              ELSE range(0, k % 3 + 1) END AS l FROM n),
            g1 AS (
              SELECT k, 'seq' AS src, CAST(i - 1 AS BIGINT) AS pos, l[i] AS val
              FROM sq, unnest(range(1, len(l) + 1)) t(i)
              UNION ALL
              SELECT k, 'seq', NULL, NULL FROM sq WHERE len(l) = 0),
            g2 AS (
              SELECT k, 'stack_nat' AS src, CAST(NULL AS BIGINT) AS pos, k AS val FROM n
              UNION ALL
              SELECT k, 'stack_reg', NULL, r FROM n),
            g3 AS (
              SELECT k, 'rep' AS src, CAST(i - 1 AS BIGINT) AS pos, r AS val
              FROM n, unnest(range(1, 3)) t(i)),
            fl AS (SELECT k, flatten([range(1, 3), range(3, 4 + k % 2)]) AS l FROM n),
            g4 AS (
              SELECT k, 'flat' AS src, CAST(i - 1 AS BIGINT) AS pos, l[i] AS val
              FROM fl, unnest(range(1, len(l) + 1)) t(i))
            SELECT * FROM (
              SELECT * FROM g1 UNION ALL SELECT * FROM g2
              UNION ALL SELECT * FROM g3 UNION ALL SELECT * FROM g4)
            ORDER BY k, src, pos NULLS FIRST, val NULLS FIRST"""))

  /** Distribution-drift monitor — the data-quality alarm every ingest
    * pipeline runs: per day, how far does the event-type mix deviate from
    * the corpus-wide baseline? The score is the LIFT of a day's type share
    * over the global type share in thousandths — `1000·o·N div (n_d·C_t)`
    * where o = count(day, type), n_d = day total, C_t = global type count,
    * N = grand total — the same integer association form as x99's PMI
    * lift, so the whole monitor hash-verifies (no floats, no logs).
    * `drifted` flags |lift − 1000| ≥ the threshold (per-mille deviation).
    *
    * Scale shape: the fact table is scanned and aggregated ONCE (a
    * two-column projection into the day×type cell grid, map-side
    * partial); both marginals and the grand total are rollups OF the
    * domain-sized cell table, which is checkpointed so they reread a
    * grid, not the facts. At 100 TB this is the same plan; the day×type
    * grid stays tiny no matter how many events feed it. Overflow:
    * o·N·1000 needs longs until ~3·10⁶ events per cell pair; past
    * that, decimal(38,0) as x89 maps.
    *
    * Retention: the checkpointed grid's blocks live in executor storage
    * until the session ends (grid-sized — day×type cells, not facts; a
    * monitor that re-runs in a long-lived session should `unpersist` the
    * previous report's grid, the way compaction scopes its
    * `localCheckpoint(true)` to a single write).
    */
  def typeDriftByDay(e: DataFrame, driftMilli: Long): DataFrame = {
    val cell = e.select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(false)
    val byDay = cell.groupBy(col("day")).agg(sum(col("o")).as("n_day"))
    val byType = cell.groupBy(col("event_type")).agg(sum(col("o")).as("c_type"))
    val total = cell.agg(sum(col("o")).as("n_total"))
    cell.join(broadcast(byDay), "day")
      .join(broadcast(byType), "event_type")
      .crossJoin(broadcast(total))
      .withColumn("lift_milli", expr("(1000 * o * n_total) div (n_day * c_type)"))
      .select(col("day"), col("event_type"), col("o"), col("n_day"),
        col("c_type"), col("lift_milli"),
        (abs(col("lift_milli") - 1000) >= driftMilli).as("drifted"))
      .orderBy("day", "event_type")
  }

  private val x103 = GQuery(
    "x103_type_drift_monitor", "ext-events drift-monitor data-quality",
    (s, dir) => typeDriftByDay(events(s, dir), driftMilli = 200L),
    Some("""WITH t AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
            cell AS (SELECT day, event_type, COUNT(*) AS o
                     FROM t GROUP BY day, event_type),
            d AS (SELECT day, COUNT(*) AS n_day FROM t GROUP BY day),
            ty AS (SELECT event_type, COUNT(*) AS c_type FROM t GROUP BY event_type),
            n AS (SELECT COUNT(*) AS n_total FROM t)
            SELECT c.day, c.event_type, c.o, d.n_day, ty.c_type,
              (1000 * c.o * n.n_total) // (d.n_day * ty.c_type) AS lift_milli,
              abs((1000 * c.o * n.n_total) // (d.n_day * ty.c_type) - 1000) >= 200
                AS drifted
            FROM cell c JOIN d USING (day) JOIN ty USING (event_type), n
            ORDER BY day, event_type"""))

  /** Heavy-hitter skew report — the diagnostic read before every big join
    * or aggregation lands on a cluster: the top-k keys of a column by
    * exact frequency, each with its share of the table in thousandths and
    * a cumulative share. A key near `1000/k_partitions` share is the one
    * that makes a shuffle partition straggle; the salting/AQE-skew
    * decision starts from exactly this table (SkewSpec demonstrates the
    * fix; this op is how production finds the key to fix).
    *
    * Scale shape: one map-side-partial aggregation (key-cardinality
    * sized), one broadcast scalar for the total, TakeOrderedAndProject
    * top-k (per-partition heaps — only k rows reach the driver), and a
    * k-row window for the cumulative share. Exact, not sketched: the c20
    * count-min/x20 sketch family answers the same question at bounded
    * memory when key cardinality itself is the problem; a skew DIAGNOSIS
    * wants the exact counts it will be audited against.
    */
  def heavyHitters(d: DataFrame, keyCol: String, topK: Int): DataFrame = {
    // checkpointed so the total is a rollup of the (key-cardinality-sized)
    // count table rather than a second scan of the facts — the x99/x103
    // aggregate-once discipline; blocks are count-table-sized and retained
    // until session end (see typeDriftByDay's retention note)
    val counts = d.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val total = counts.agg(sum(col("c")).as("n_total"))
    val top = counts.crossJoin(broadcast(total))
      .orderBy(col("c").desc, col("key"))
      .limit(topK)
    // k-row table: the single-partition window is over the REPORT, not data
    val order = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("key"))
    val cum = order.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    top
      .withColumn("rnk", row_number().over(order).cast("long"))
      .withColumn("cum_c", sum(col("c")).over(cum))
      .withColumn("share_milli", expr("(1000 * c) div n_total"))
      .withColumn("cum_share_milli", expr("(1000 * cum_c) div n_total"))
      .select(col("rnk"), col("key"), col("c"), col("n_total"),
        col("share_milli"), col("cum_share_milli"))
      .orderBy("rnk")
  }

  private val x106 = GQuery(
    "x106_skew_report", "ext-events data-quality skew-diagnostic",
    (s, dir) => heavyHitters(events(s, dir), "user_id", topK = 20),
    Some("""WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS c
                       FROM events GROUP BY 1),
            n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM c),
            top AS (SELECT key, c, n_total FROM c, n
                    ORDER BY c DESC, key LIMIT 20)
            SELECT CAST(row_number() OVER (ORDER BY c DESC, key) AS BIGINT) AS rnk,
              key, c, n_total,
              (1000 * c) // n_total AS share_milli,
              CAST((1000 * SUM(c) OVER (ORDER BY c DESC, key
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) // n_total
                AS BIGINT) AS cum_share_milli
            FROM top ORDER BY rnk"""))

  /** Column-profile report — the schema-on-read audit (the Deequ/Great
    * Expectations shape) a pipeline runs on every new source before
    * trusting it: per column, row/null/distinct counts plus typed min/max
    * (numeric columns in the `_num` pair, strings in the `_str` pair —
    * never a double rendered through a string, which no two engines format
    * alike). One row per profiled column, assembled as a union of
    * per-column aggregates.
    *
    * Scale shape: each column profiles in one map-side-partial aggregate
    * over a single-column projection (the scan prunes to exactly that
    * column); the union is columns-sized. Exact distincts by the same
    * audit argument as [[heavyHitters]] — c21/c30 are the sketch
    * alternatives when cardinality alone is the question.
    */
  def profileColumns(d: DataFrame, numeric: Seq[String],
      strings: Seq[String]): DataFrame = {
    val parts =
      numeric.map { c =>
        d.agg(count(lit(1)).as("n_rows"),
            sum(col(c).isNull.cast("long")).as("n_null"),
            countDistinct(col(c)).as("n_distinct"),
            min(col(c)).cast("double").as("min_num"),
            max(col(c)).cast("double").as("max_num"))
          .select(lit(c).as("column"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_num"), col("max_num"),
            lit(null).cast("string").as("min_str"),
            lit(null).cast("string").as("max_str"))
      } ++ strings.map { c =>
        d.agg(count(lit(1)).as("n_rows"),
            sum(col(c).isNull.cast("long")).as("n_null"),
            countDistinct(col(c)).as("n_distinct"),
            min(col(c)).as("min_str"), max(col(c)).as("max_str"))
          .select(lit(c).as("column"), col("n_rows"), col("n_null"),
            col("n_distinct"),
            lit(null).cast("double").as("min_num"),
            lit(null).cast("double").as("max_num"),
            col("min_str"), col("max_str"))
      }
    parts.reduce(_ unionByName _).orderBy("column")
  }

  private val x107 = GQuery(
    "x107_column_profile", "ext-events data-quality profiling",
    (s, dir) => profileColumns(events(s, dir),
      numeric = Seq("event_id", "user_id", "value"),
      strings = Seq("event_type", "props")),
    Some("""WITH p AS (
              SELECT 'event_id' AS "column", COUNT(*) AS n_rows,
                CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                COUNT(DISTINCT event_id) AS n_distinct,
                CAST(MIN(event_id) AS DOUBLE) AS min_num,
                CAST(MAX(event_id) AS DOUBLE) AS max_num,
                CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
              FROM events
              UNION ALL
              SELECT 'user_id', COUNT(*),
                CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                COUNT(DISTINCT user_id),
                CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE),
                NULL, NULL
              FROM events
              UNION ALL
              SELECT 'value', COUNT(*),
                CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                COUNT(DISTINCT value),
                CAST(MIN(value) AS DOUBLE), CAST(MAX(value) AS DOUBLE),
                NULL, NULL
              FROM events
              UNION ALL
              SELECT 'event_type', COUNT(*),
                CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                COUNT(DISTINCT event_type), NULL, NULL,
                MIN(event_type), MAX(event_type)
              FROM events
              UNION ALL
              SELECT 'props', COUNT(*),
                CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                COUNT(DISTINCT props), NULL, NULL,
                MIN(props), MAX(props)
              FROM events)
            SELECT * FROM p ORDER BY "column""""))

  val queries: Seq[GQuery] = Seq(x49, c38, x103, x106, x107)
}
