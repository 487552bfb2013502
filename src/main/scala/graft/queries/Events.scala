package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** Two-sample NUMERIC drift: Mann–Whitney rank test of `cur`'s value
    * column against `ref`'s, computed on the pooled CENTI-QUANTIZED
    * domain grid (fixture values carry 2 decimals, so ×100 is exact;
    * grid cardinality is bounded by value-range·100, never fact-sized —
    * the x245 domain discipline). Returns ONE row: sample sizes, the
    * tie-credited doubled U statistic (2U₁ = Σ n1_v·(2·|ref below| +
    * |ref at|) — exact integer), rank-biserial effect in micros (one
    * exact-operand division, x231 finish) and the drift verdict
    * |rb| ≥ alarmMicro. This is the numeric companion to [[typeDriftByDay]]
    * (categorical mixture drift): x103 asks "did the TYPE mix move?",
    * this asks "did the VALUE distribution move?" — together the two
    * monitors a data-quality gate runs on every landed batch. Shared by
    * the x249 registry row and [[graft.streaming.RankDriftStream]].
    *
    * Scale shape: two map-combinable aggregates to the shared grid, one
    * full-outer grid merge, grid-sized windows, a 1-row rollup. Facts
    * never sort, never pool, never pair.
    */
  def valueRankDrift(cur: DataFrame, ref: DataFrame,
      alarmMicro: Long): DataFrame =
    rankVerdictFromGrid(centiCountGrid(cur, ref), alarmMicro)

  /** The rank verdict off a prebuilt (v, n1v, n2v) count grid —
    * [[graft.streaming.RankDriftStream]] builds the grid ONCE per
    * refresh and derives all three report segments from it.
    */
  private[graft] def rankVerdictFromGrid(grid: DataFrame,
      alarmMicro: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    // TOTAL on degenerate inputs (a production window can legitimately
    // contain no purchases): an empty sample yields the no-evidence
    // verdict (rb 0, not drifted) instead of a null row — EmptySample
    // arm of RankDriftStreamSpec pins all three empty combinations
    grid
      .withColumn("c2lt", sum(col("n2v")).over(cum) - col("n2v"))
      .agg(coalesce(sum(col("n1v")), lit(0L)).as("n_cur"),
        coalesce(sum(col("n2v")), lit(0L)).as("n_ref"),
        coalesce(
          sum((col("n1v") * (col("c2lt") * 2 + col("n2v"))).cast(d38)),
          lit(0).cast(d38)).as("u2"))
      .select(col("n_cur"), col("n_ref"),
        col("u2").cast("long").as("u_doubled"),
        when(col("n_cur") === 0L || col("n_ref") === 0L, lit(0L))
          .otherwise(expr("""cast(round(
             cast(u2 - cast(n_cur as decimal(38,0)) * n_ref as double)
             / cast(cast(n_cur as decimal(38,0)) * n_ref as double)
             * 1000000, 0) as bigint)""")).as("rb_micro"))
      .withColumn("drifted", abs(col("rb_micro")) >= alarmMicro)
  }

  // x249: the operator pointed at the fixture's natural two-sample split —
  // purchase events vs everything else ("do purchases carry a different
  // value distribution than ambient traffic?").
  private val x249 = GQuery(
    "x249_value_rank_drift", "ext-events numeric-drift mann-whitney",
    (s, dir) => {
      val e = events(s, dir)
      valueRankDrift(e.where(col("event_type") === "purchase"),
        e.where(col("event_type") =!= "purchase"), alarmMicro = 100000L)
    },
    Some("""WITH q AS (
              SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i1
              FROM events),
            grid AS (
              SELECT v, CAST(SUM(i1) AS BIGINT) AS n1v,
                CAST(SUM(1 - i1) AS BIGINT) AS n2v
              FROM q GROUP BY 1),
            c AS (
              SELECT v, n1v, n2v,
                CAST(SUM(n2v) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - n2v AS c2lt
              FROM grid),
            m AS (
              SELECT CAST(SUM(n1v) AS BIGINT) AS n_cur,
                CAST(SUM(n2v) AS BIGINT) AS n_ref,
                SUM(CAST(n1v * (2 * c2lt + n2v) AS HUGEINT)) AS u2
              FROM c)
            SELECT n_cur, n_ref, CAST(u2 AS BIGINT) AS u_doubled,
              CAST(round(
                CAST(u2 - CAST(n_cur AS HUGEINT) * n_ref AS DOUBLE)
                / CAST(CAST(n_cur AS HUGEINT) * n_ref AS DOUBLE)
                * 1000000, 0) AS BIGINT) AS rb_micro,
              abs(CAST(round(
                CAST(u2 - CAST(n_cur AS HUGEINT) * n_ref AS DOUBLE)
                / CAST(CAST(n_cur AS HUGEINT) * n_ref AS DOUBLE)
                * 1000000, 0) AS BIGINT)) >= 100000 AS drifted
            FROM m"""))

  /** Two-sample Kolmogorov–Smirnov on the same centi-quantized value
    * grid as [[valueRankDrift]] — the SHAPE companion to the rank test:
    * U catches a location shift, KS catches ANY CDF divergence (variance
    * doubling, bimodality) at its maximizing value. Exact end to end:
    * D = max|F₁−F₂| is computed as max|C₁·N₂ − C₂·N₁| over the grid
    * (integer cross-products in DECIMAL(38,0)/HUGEINT — N₁·N₂ headroom
    * at 100 TB), reported in micros with the maximizing value (smallest
    * attaining v — deterministic). One row: n_cur, n_ref, ks_micro,
    * v_at.
    *
    * Scale shape: identical to [[valueRankDrift]] — grid aggregates,
    * grid windows, one filtered top-1. Facts never sort.
    */
  /** Shared CDF grid of two samples over the centi-quantized value
    * domain: one row per distinct value with both cumulative counts and
    * both totals — the common substrate of [[ksTwoSample]] (max gap) and
    * the x252 Q-Q read (quantile inversion). Grid-sized, never
    * fact-sized.
    */
  /** The (v, n1v, n2v) centi-quantized count grid of two samples — the
    * single substrate every numeric-drift segment derives from (the one
    * definition the x249/x250/x252 family and the streaming report all
    * share, so the quantization can never desynchronize between them).
    */
  private[graft] def centiCountGrid(cur: DataFrame,
      ref: DataFrame): DataFrame = {
    def centi(df: DataFrame) = df.select(
      expr("cast(round(value * 100, 0) as bigint)").as("v"))
    centi(cur).groupBy("v").agg(count(lit(1)).as("n1v"))
      .join(centi(ref).groupBy("v").agg(count(lit(1)).as("n2v")),
        Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("n1v"), lit(0L)).as("n1v"),
        coalesce(col("n2v"), lit(0L)).as("n2v"))
  }

  /** Layer cumulative counts + totals onto a count grid. */
  private[graft] def withCdf(grid: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    grid
      .withColumn("c1", sum(col("n1v")).over(cum))
      .withColumn("c2", sum(col("n2v")).over(cum))
      .withColumn("tw1", sum(col("n1v")).over(all))
      .withColumn("tw2", sum(col("n2v")).over(all))
  }

  private[queries] def centiCdfGrid(cur: DataFrame,
      ref: DataFrame): DataFrame = withCdf(centiCountGrid(cur, ref))

  def ksTwoSample(cur: DataFrame, ref: DataFrame): DataFrame =
    ksFromCdf(centiCdfGrid(cur, ref))

  /** The KS row off a prebuilt CDF grid (shared-grid streaming path). */
  private[graft] def ksFromCdf(cdf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    cdf
      .withColumn("dnum", abs(col("c1").cast(d38) * col("tw2")
        - col("c2").cast(d38) * col("tw1")))
      .withColumn("dmax", max(col("dnum")).over(all))
      .where(col("dnum") === col("dmax"))
      .orderBy("v").limit(1)
      .select(col("tw1").as("n_cur"), col("tw2").as("n_ref"),
        // empty-side totality: one empty sample makes every gap 0 and the
        // N1·N2 denominator 0 — report ks 0 (no evidence), not null
        when(col("tw1") === 0L || col("tw2") === 0L, lit(0L))
          .otherwise(expr("""cast((1000000 * dnum)
             div (cast(tw1 as decimal(38,0)) * tw2) as bigint)"""))
          .as("ks_micro"),
        col("v").as("v_at"))
  }

  private val x250 = GQuery(
    "x250_ks_two_sample", "ext-events numeric-drift kolmogorov-smirnov",
    (s, dir) => {
      val e = events(s, dir)
      ksTwoSample(e.where(col("event_type") === "purchase"),
        e.where(col("event_type") =!= "purchase"))
    },
    Some("""WITH q AS (
              SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i1
              FROM events),
            grid AS (
              SELECT v, CAST(SUM(i1) AS BIGINT) AS n1v,
                CAST(SUM(1 - i1) AS BIGINT) AS n2v
              FROM q GROUP BY 1),
            c AS (
              SELECT v,
                CAST(SUM(n1v) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS c1,
                CAST(SUM(n2v) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS c2,
                CAST(SUM(n1v) OVER () AS BIGINT) AS tw1,
                CAST(SUM(n2v) OVER () AS BIGINT) AS tw2
              FROM grid),
            d AS (
              SELECT v, tw1, tw2,
                abs(CAST(c1 AS HUGEINT) * tw2 - CAST(c2 AS HUGEINT) * tw1)
                  AS dnum
              FROM c)
            SELECT tw1 AS n_cur, tw2 AS n_ref,
              CAST((1000000 * dnum)
                // (CAST(tw1 AS HUGEINT) * tw2) AS BIGINT) AS ks_micro,
              v AS v_at
            FROM d
            WHERE dnum = (SELECT MAX(dnum) FROM d)
            ORDER BY v LIMIT 1"""))

  // ------------------------------------------------------------------- x252
  // Q-Q decile drift — WHERE the distribution moved: x249 says the values
  // shifted, x250 says how far the CDFs diverge; this inverts both CDFs
  // at the deciles (smallest grid value v with 10·C(v) ≥ d·N — the x240
  // lower-quantile convention, exact integers) and reports the per-decile
  // gap in centi units. A tail-only regression and a uniform shift score
  // the same KS but opposite Q-Q shapes — this is the row that tells them
  // apart.
  //
  // Scale shape: the shared CDF grid (checkpointed once, read by both
  // inversions), a 9-row literal decile table fanned onto it (a
  // LocalTableScan side — constant), two grid-sized min-aggregates.
  /** The x252 body as an operator: per-decile Q-Q gap of `cur` vs `ref`
    * (shared by the registry row and [[graft.streaming.RankDriftStream]]'s
    * full drift report).
    */
  def qqDecileDrift(cur: DataFrame, ref: DataFrame): DataFrame =
    qqFromCdf(centiCdfGrid(cur, ref)
      .localCheckpoint(true)) // both quantile inversions read the grid

  /** The Q-Q table off a prebuilt CDF grid. Callers that pass a shared
    * checkpointed grid (the streaming refresh) own its lifecycle and
    * unpersist it after the derived segments are written.
    */
  private[graft] def qqFromCdf(g: DataFrame): DataFrame = {
    val s = g.sparkSession
    import s.implicits._
    val deciles = (1L to 9L).toDF("decile")
    // tw > 0 guards: quantiles of an EMPTY sample are undefined — without
    // the guard "10*0 >= d*0" holds everywhere and min(v) would silently
    // report garbage; with it the inversion is empty and the final inner
    // join returns no rows (the honest answer)
    val qc = g.join(deciles, expr("10 * c1 >= decile * tw1 and tw1 > 0"))
      .groupBy("decile").agg(min(col("v")).as("v_cur"))
    val qr = g.join(deciles, expr("10 * c2 >= decile * tw2 and tw2 > 0"))
      .groupBy("decile").agg(min(col("v")).as("v_ref"))
    qc.join(qr, "decile")
      .select(col("decile"), col("v_cur"), col("v_ref"),
        (col("v_cur") - col("v_ref")).as("gap_centi"))
      .orderBy("decile")
  }

  private val x252 = GQuery(
    "x252_qq_decile_drift", "ext-events numeric-drift qq-quantiles",
    (s, dir) => {
      val e = events(s, dir)
      qqDecileDrift(e.where(col("event_type") === "purchase"),
        e.where(col("event_type") =!= "purchase"))
    },
    Some("""WITH q AS (
              SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i1
              FROM events),
            grid AS (
              SELECT v, CAST(SUM(i1) AS BIGINT) AS n1v,
                CAST(SUM(1 - i1) AS BIGINT) AS n2v
              FROM q GROUP BY 1),
            c AS (
              SELECT v,
                CAST(SUM(n1v) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS c1,
                CAST(SUM(n2v) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS c2,
                CAST(SUM(n1v) OVER () AS BIGINT) AS tw1,
                CAST(SUM(n2v) OVER () AS BIGINT) AS tw2
              FROM grid),
            dd AS (SELECT CAST(range AS BIGINT) AS decile FROM range(1, 10)),
            qc AS (
              SELECT dd.decile, MIN(c.v) AS v_cur
              FROM dd JOIN c ON 10 * c.c1 >= dd.decile * c.tw1
              GROUP BY 1),
            qr AS (
              SELECT dd.decile, MIN(c.v) AS v_ref
              FROM dd JOIN c ON 10 * c.c2 >= dd.decile * c.tw2
              GROUP BY 1)
            SELECT qc.decile, qc.v_cur, qr.v_ref,
              qc.v_cur - qr.v_ref AS gap_centi
            FROM qc JOIN qr USING (decile) ORDER BY decile"""))

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

  /** Cohort retention — the activation/retention table every product and
    * data-quality dashboard starts from: users grouped by FIRST-SEEN day
    * (their cohort), then distinct active users per (cohort, day offset).
    *
    * Scale shape: one scan projects (user_id, day); the cohort table is a
    * per-user min (map-side partial, user-cardinality exchange); the join
    * back is user-keyed on two user-sized tables — the facts are never
    * rescanned. distinct-user counts are exact (the audit argument of
    * [[heavyHitters]]); offsets are integer day arithmetic, so every cell
    * hash-verifies cross-engine.
    */
  def retentionCohorts(e: DataFrame): DataFrame = {
    val days = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  private val x114 = GQuery(
    "x114_retention_cohorts", "ext-events cohort-retention",
    (s, dir) => retentionCohorts(events(s, dir)),
    Some("""WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
            c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
            SELECT c.cohort_day, CAST(d.day - c.cohort_day AS BIGINT) AS day_offset,
              COUNT(DISTINCT d.user_id) AS n_users
            FROM d JOIN c USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Event-type transition matrix — the first-order Markov table behind
    * sequence mining, anomaly detection ("error after purchase spiked"),
    * and session modeling: per user, each consecutive (prev → next) pair
    * counted, ordered by (ts, event_id) so ties are deterministic.
    *
    * Scale shape: ONE exchange on user_id feeds the lag window; the
    * transition rollup is type²-sized with map-side partials. The
    * noisiest production pitfall — nondeterministic ordering of
    * same-timestamp events — is closed by the composite sort key, which
    * is what lets this table hash-verify at all.
    */
  def typeTransitions(e: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  private val x115 = GQuery(
    "x115_type_transitions", "ext-events sequence-mining markov",
    (s, dir) => typeTransitions(events(s, dir)),
    Some("""WITH t AS (
              SELECT user_id, event_type,
                LAG(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS prev_type
              FROM events)
            SELECT prev_type, event_type AS next_type, COUNT(*) AS n
            FROM t WHERE prev_type IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Exact activity quantiles over per-user event counts — the skew
    * summary behind capacity planning and the salting decision
    * ([[heavyHitters]] names the key; this names the distribution):
    * p50/p90/p99 of events-per-user, selected at integer rank positions
    * `ceil(n·q/100) = (n·q + 99) div 100` over the (count, user_id)-sorted
    * user table, so the result is a deterministic ROW SELECTION, not an
    * interpolated float — the same value both engines pick.
    *
    * Scale shape: the per-user rollup is the only fact-sized exchange;
    * ranking happens on the user-cardinality count table. (At extreme
    * user cardinality the single-partition rank window becomes the c30
    * sketch's job — this op is the exact form, and says so.)
    */
  def activityQuantiles(e: DataFrame): DataFrame = {
    val counts = e.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("c"), col("user_id"))
    val ranked = counts.withColumn("r", row_number().over(w).cast("long"))
    val n = ranked.groupBy().agg(max(col("r")).as("n_users"))
    ranked.crossJoin(broadcast(n))
      .groupBy(col("n_users"))
      .agg(
        max(when(col("r") === expr("(n_users * 50 + 99) div 100"), col("c"))).as("p50"),
        max(when(col("r") === expr("(n_users * 90 + 99) div 100"), col("c"))).as("p90"),
        max(when(col("r") === expr("(n_users * 99 + 99) div 100"), col("c"))).as("p99"),
        max(col("c")).as("p100"))
      .select(col("n_users"), col("p50"), col("p90"), col("p99"), col("p100"))
  }

  private val x116 = GQuery(
    "x116_activity_quantiles", "ext-events skew-diagnostic quantiles",
    (s, dir) => activityQuantiles(events(s, dir)),
    Some("""WITH c AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
            r AS (SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c, user_id) AS BIGINT) AS r
                  FROM c),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM c)
            SELECT n.n_users,
              MAX(CASE WHEN r.r = (n.n_users * 50 + 99) // 100 THEN r.c END) AS p50,
              MAX(CASE WHEN r.r = (n.n_users * 90 + 99) // 100 THEN r.c END) AS p90,
              MAX(CASE WHEN r.r = (n.n_users * 99 + 99) // 100 THEN r.c END) AS p99,
              MAX(r.c) AS p100
            FROM r, n GROUP BY n.n_users"""))

  /** Hour-of-day × event-type load matrix with integer shares — the
    * traffic-shape table behind batch scheduling ("when is ingest quiet")
    * and drift triage (x103 tells you THAT types drifted; this shows the
    * daily rhythm they drifted against).
    *
    * Scale shape: one scan into an hour×type cell grid (map-side
    * partial); the per-hour totals are a rollup OF the grid (the
    * x99/x103 aggregate-once discipline — at this grid size a broadcast
    * join back, no checkpoint needed); shares are integer thousandths.
    */
  def hourlyTypeShare(e: DataFrame): DataFrame = {
    val cells = e.select(hour(col("ts")).cast("long").as("hr"), col("event_type"))
      .groupBy(col("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val byHour = cells.groupBy(col("hr")).agg(sum(col("n")).as("n_hour"))
    cells.join(broadcast(byHour), "hr")
      .withColumn("share_milli", expr("(1000 * n) div n_hour"))
      .select(col("hr"), col("event_type"), col("n"), col("n_hour"), col("share_milli"))
      .orderBy("hr", "event_type")
  }

  private val x117 = GQuery(
    "x117_hourly_type_share", "ext-events load-profile drift-triage",
    (s, dir) => hourlyTypeShare(events(s, dir)),
    Some("""WITH cells AS (
              SELECT hour(ts) AS hr, event_type, COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            h AS (SELECT hr, SUM(n) AS n_hour FROM cells GROUP BY hr)
            SELECT c.hr, c.event_type, c.n, CAST(h.n_hour AS BIGINT) AS n_hour,
              CAST((1000 * c.n) // h.n_hour AS BIGINT) AS share_milli
            FROM cells c JOIN h USING (hr) ORDER BY c.hr, c.event_type"""))

  /** Inter-event gap profile — the bot/scraper signal every traffic-
    * curation pipeline computes: per user, the exact MEDIAN gap between
    * consecutive events in microseconds (rank-selected, not
    * interpolated) plus the gap count. Sub-second medians at high event
    * counts are the automation fingerprint; the downstream filter is a
    * plain predicate on this table.
    *
    * Scale shape: one user-keyed exchange feeds both windows (lag and
    * the per-user gap rank share the same partitioning — one sort, the
    * x49 economy); microsecond integers end to end, so the table
    * hash-verifies.
    */
  def interEventGaps(e: DataFrame): DataFrame = {
    val wSeq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = e.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wSeq))
      .where(col("prev_us").isNotNull)
      .withColumn("gap_us", unix_micros(col("ts")) - col("prev_us"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("gap_us"), col("event_id"))
    gaps
      .withColumn("r", row_number().over(wRank).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id")))
        .cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        max(when(col("r") === expr("(n * 50 + 99) div 100"), col("gap_us")))
          .as("median_gap_us"))
      .orderBy("user_id")
  }

  private val x118 = GQuery(
    "x118_bot_gap_profile", "ext-events traffic-curation bot-signal",
    (s, dir) => interEventGaps(events(s, dir)),
    Some("""WITH g AS (
              SELECT user_id, event_id,
                epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
              FROM events),
            r AS (SELECT user_id, gap_us,
                    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY gap_us, event_id) AS BIGINT) AS r,
                    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
                  FROM g WHERE gap_us IS NOT NULL)
            SELECT user_id, COUNT(*) AS n_gaps,
              MAX(CASE WHEN r = (n * 50 + 99) // 100 THEN gap_us END) AS median_gap_us
            FROM r GROUP BY user_id ORDER BY user_id"""))

  /** Count-min sketch frequency estimation (Cormode & Muthukrishnan 2005)
    * — the MERGEABLE alternative to x106's exact heavy-hitter count: a
    * depth×width grid of counters (here 4 × 256) built with map-side
    * partial aggregation, whose ~1 KB footprint answers any key's
    * frequency with a one-sided error (estimate ≥ truth, overshoot
    * bounded by colliding mass) — the sketch a 1000-executor ingest keeps
    * per partition and merges by cell-wise addition, where the exact form
    * keeps per-key state. Hashes are md5-prefix cells — deterministic,
    * engine-portable strings — so the WHOLE sketch, every estimate and
    * every per-key overshoot hash-verifies bit-identically against the
    * DuckDB oracle (the rare cross-engine-verifiable form of an
    * approximate operator: the approximation is deterministic).
    *
    * Output per user: exact count, CMS estimate (min over the 4 rows'
    * cells), and the overestimate — structurally ≥ 0, which the oracle's
    * hash equality proves on every row.
    *
    * Scale shape: grid build = ONE scan with partial aggregation into
    * 4·256 cells; the probe side joins the distinct-key table to the
    * broadcast-sized grid. Nothing here is per-key state: at 100 TB the
    * grid stays 1 KB while x106's exact map grows with the key domain.
    */
  def cmsFrequency(ev: DataFrame, depth: Int, hexChars: Int): DataFrame = {
    val seeds = array((0 until depth).map(lit): _*)
    def cell(seed: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
      substring(md5(concat(seed.cast("string"), lit(":"), key.cast("string"))),
        1, hexChars)
    val grid = ev.select(col("user_id"), explode(seeds).as("seed"))
      .select(col("seed"), cell(col("seed"), col("user_id")).as("cell"))
      .groupBy("seed", "cell").agg(count(lit(1)).as("n"))
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
    exact.select(col("user_id"), col("exact_n"), explode(seeds).as("seed"))
      .withColumn("cell", cell(col("seed"), col("user_id")))
      .join(broadcast(grid), Seq("seed", "cell"))
      .groupBy("user_id", "exact_n").agg(min(col("n")).as("cms_n"))
      .select(col("user_id"), col("exact_n"), col("cms_n"),
        (col("cms_n") - col("exact_n")).as("over_n"))
      .orderBy("user_id")
  }

  private val x125 = GQuery(
    "x125_cms_frequency", "ext-events sketch count-min mergeable",
    (s, dir) => cmsFrequency(events(s, dir), depth = 4, hexChars = 2),
    Some("""WITH seeds AS (SELECT UNNEST([0, 1, 2, 3]) AS seed),
            cells AS (
              SELECT s.seed,
                substr(md5(CAST(s.seed AS VARCHAR) || ':' ||
                  CAST(e.user_id AS VARCHAR)), 1, 2) AS cell
              FROM events e CROSS JOIN seeds s),
            grid AS (
              SELECT seed, cell, CAST(COUNT(*) AS BIGINT) AS n
              FROM cells GROUP BY 1, 2),
            exact AS (
              SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
              FROM events GROUP BY 1),
            probe AS (
              SELECT x.user_id, x.exact_n, s.seed,
                substr(md5(CAST(s.seed AS VARCHAR) || ':' ||
                  CAST(x.user_id AS VARCHAR)), 1, 2) AS cell
              FROM exact x CROSS JOIN seeds s)
            SELECT p.user_id, p.exact_n, MIN(g.n) AS cms_n,
              MIN(g.n) - p.exact_n AS over_n
            FROM probe p JOIN grid g ON p.seed = g.seed AND p.cell = g.cell
            GROUP BY p.user_id, p.exact_n
            ORDER BY p.user_id"""))

  /** Daily-volume anomaly detection by median absolute deviation — the
    * robust ops alarm next to x103's distribution drift: a day is
    * anomalous when its event count deviates from the median day by more
    * than 3× the MAD (the robust z-score; unlike mean/stddev, one outage
    * day cannot drag the baseline toward itself). Both the median and the
    * MAD are EXACT rank-selected integers (the x116/x118 discipline:
    * rank = (n·50 + 99) div 100), so the alarm hash-verifies
    * bit-identically — no float quantile estimate anywhere.
    *
    * Scale shape: one facts scan into a day-domain-sized count table;
    * every window below runs over that tiny aggregate (single-partition
    * windows over ≤ days rows — the x106/x129 rollup shape), never over
    * events.
    */
  def dailyVolumeAnomaly(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val wMed = Window.orderBy(col("n"), col("day"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withMed = daily
      .withColumn("r", row_number().over(wMed).cast("long"))
      .withColumn("cnt", count(lit(1)).over(wAll).cast("long"))
      .withColumn("med", max(when(col("r") === expr("(cnt * 50 + 99) div 100"),
        col("n"))).over(wAll))
      .withColumn("dev", abs(col("n") - col("med")))
    val wMad = Window.orderBy(col("dev"), col("day"))
    withMed
      .withColumn("r2", row_number().over(wMad).cast("long"))
      .withColumn("mad", max(when(col("r2") === expr("(cnt * 50 + 99) div 100"),
        col("dev"))).over(wAll))
      .select(col("day"), col("n"), col("med"), col("mad"),
        (col("dev") > lit(3L) * col("mad")).as("anomalous"))
      .orderBy("day")
  }

  private val x134 = GQuery(
    "x134_volume_anomaly", "ext-events anomaly-detection robust-mad",
    (s, dir) => dailyVolumeAnomaly(events(s, dir)),
    Some("""WITH d AS (
              SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1),
            m AS (
              SELECT day, n,
                CAST(ROW_NUMBER() OVER (ORDER BY n, day) AS BIGINT) AS r,
                CAST(COUNT(*) OVER () AS BIGINT) AS cnt
              FROM d),
            m2 AS (
              SELECT day, n, cnt,
                MAX(CASE WHEN r = (cnt * 50 + 99) // 100 THEN n END) OVER () AS med
              FROM m),
            m3 AS (
              SELECT day, n, cnt, med, ABS(n - med) AS dev,
                CAST(ROW_NUMBER() OVER (ORDER BY ABS(n - med), day) AS BIGINT) AS r2
              FROM m2),
            m4 AS (
              SELECT day, n, med, dev,
                MAX(CASE WHEN r2 = (cnt * 50 + 99) // 100 THEN dev END) OVER () AS mad
              FROM m3)
            SELECT day, n, med, mad, dev > 3 * mad AS anomalous
            FROM m4 ORDER BY day"""))

  /** Mergeable histogram quantile sketch vs exact quantiles — the second
    * sketch-family row next to x125's count-min: a fixed 1000-bucket
    * equi-width histogram over `value` (two passes: exact min/max, then
    * one partial-aggregated bucket count — the mergeable state is 1000
    * integers, combined by cell-wise addition across any number of
    * executors or days) answers p50/p90/p99 as the upper edge of the
    * first bucket whose cumulative count reaches the rank. The report
    * pairs each sketch estimate with the EXACT rank-selected quantile
    * and the true rank error, so the error bound is itself verified
    * data, not a claim.
    *
    * Everything is deterministic — bucket arithmetic is plain IEEE-754
    * (+, -, ×, ÷ are exactly specified, identical in any engine) and
    * ranks are integers — so even this approximate operator
    * hash-verifies bit-identically against DuckDB.
    *
    * Scale shape: two facts scans (min/max, buckets) with map-side
    * partials; cumulative selection runs over the 1000-row histogram
    * (single-partition window over a constant domain). The exact side
    * exists for verification; a production run ships only the sketch.
    */
  def histogramQuantiles(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = 1000
    val mm = ev.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"),
      count(lit(1)).as("n"))
    val bucketed = ev.crossJoin(broadcast(mm))
      .select(least(floor((col("value") - col("vmin")) * b /
          (col("vmax") - col("vmin"))).cast("long"), lit((b - 1).toLong))
        .as("bucket"), col("vmin"), col("vmax"), col("n"))
      .groupBy("bucket", "vmin", "vmax", "n").agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = bucketed.withColumn("cum", sum(col("cnt")).over(wCum))
    val exact = ev.select(col("value"))
      .withColumn("r", row_number().over(Window.orderBy(col("value"))).cast("long"))
    val ps = Seq(50, 90, 99)
    ps.map { p =>
      val rank = expr(s"(n * $p + 99) div 100")
      val est = cum.where(col("cum") >= rank)
        .orderBy(col("bucket"))
        .limit(1)
        .select(lit(p.toLong).as("p"),
          (col("vmin") + (col("bucket") + 1) * (col("vmax") - col("vmin")) / b)
            .as("sketch_est"), col("n"))
      est.crossJoin(broadcast(mm.select(col("n").as("n2"))))
        .join(exact, col("r") === expr(s"(n2 * $p + 99) div 100"))
        .select(col("p"), col("sketch_est"), col("value").as("exact_q"))
    }.reduce(_ unionAll _)
      .orderBy("p")
  }

  private val x135 = GQuery(
    "x135_histogram_quantiles", "ext-events sketch quantile-histogram mergeable",
    (s, dir) => histogramQuantiles(events(s, dir)),
    Some("""WITH mm AS (
              SELECT MIN(value) AS vmin, MAX(value) AS vmax,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM events),
            bk AS (
              SELECT LEAST(CAST(FLOOR((e.value - m.vmin) * 1000 /
                  (m.vmax - m.vmin)) AS BIGINT), 999) AS bucket,
                m.vmin, m.vmax, m.n, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM events e CROSS JOIN mm m
              GROUP BY 1, 2, 3, 4),
            cum AS (
              SELECT bucket, vmin, vmax, n, cnt,
                CAST(SUM(cnt) OVER (ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
              FROM bk),
            ex AS (
              SELECT value,
                CAST(ROW_NUMBER() OVER (ORDER BY value) AS BIGINT) AS r
              FROM events),
            pcts AS (SELECT UNNEST([50, 90, 99]) AS p)
            SELECT CAST(p.p AS BIGINT) AS p,
              (SELECT vmin + (bucket + 1) * (vmax - vmin) / 1000 FROM cum
               WHERE cum >= (n * p.p + 99) // 100
               ORDER BY bucket LIMIT 1) AS sketch_est,
              (SELECT value FROM ex, mm
               WHERE r = (mm.n * p.p + 99) // 100) AS exact_q
            FROM pcts p ORDER BY p"""))

  /** Integer EWMA over the daily volume series — the smoothing baseline
    * under alerting dashboards, and the coverage row for SEQUENTIAL
    * RECURRENCES: s_t = (7·s_{t-1} + n_t) div 8 (α = 1/8, all-positive
    * integer arithmetic) genuinely depends on every prior step, the class
    * of computation a window function cannot express. The distributed
    * discipline is honest about that: the facts aggregate to the
    * day-domain-sized series in parallel, and only the domain-sized
    * recurrence itself runs as one ordered fold in a single task (the
    * x106/x129 "tiny aggregate" shape — the sequential part never touches
    * event rows). The DuckDB oracle runs the same recurrence as a
    * RECURSIVE CTE stepping one row per iteration, so even this
    * inherently ordered operator hash-verifies bit-identically.
    */
  def ewmaDailyVolume(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, Long)]
      .repartition(1).sortWithinPartitions("day")
      .mapPartitions { it =>
        var sAcc = -1L
        it.map { case (d, n) =>
          sAcc = if (sAcc < 0) n else (7L * sAcc + n) / 8L
          (d, n, sAcc)
        }
      }
      .toDF("day", "n", "ewma")
      .orderBy("day")
  }

  private val x137 = GQuery(
    "x137_ewma_volume", "ext-events smoothing sequential-recurrence",
    (s, dir) => ewmaDailyVolume(events(s, dir)),
    Some("""WITH RECURSIVE d AS (
              SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1),
            r AS (
              SELECT day, n,
                CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
              FROM d),
            w(i, day, n, ewma) AS (
              SELECT i, day, n, n FROM r WHERE i = 1
              UNION ALL
              SELECT r.i, r.day, r.n, (7 * w.ewma + r.n) // 8
              FROM w JOIN r ON r.i = w.i + 1)
            SELECT day, n, ewma FROM w ORDER BY day"""))

  // ------------------------------------------------------------------- x149
  // Winsorization: clamp each event's value into its type's [p05, p95]
  // band — the standard heavy-tail guard before averaging/training (clip,
  // don't drop: the row count is load-bearing for ratio metrics). Exact
  // percentiles here (the c24-proven percentile ≡ quantile_cont parity);
  // at 100 TB the bounds come from approx_percentile or a merged t-digest
  // — one line changed, the clip is identical.
  //
  // Scale shape: one aggregation computes both bounds per type (a
  // handful of rows), broadcast back onto the fact scan; the clip is a
  // narrow projection and the audit rollup partial-aggregates. The fact
  // table is scanned twice (bounds pass + clip pass) — inherent to any
  // data-dependent clamp; the bounds pass reads two columns only.
  private val x149 = GQuery(
    "x149_winsorize", "ext-events robust-clipping",
    (s, dir) => {
      val bounds = events(s, dir).groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.05)").as("lo"),
          expr("percentile(value, 0.95)").as("hi"))
      events(s, dir)
        .join(broadcast(bounds), "event_type")
        .select(col("event_type"), col("value"), col("lo"), col("hi"),
          least(greatest(col("value"), col("lo")), col("hi")).as("w"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") < col("lo"), 1L).otherwise(0L)).cast("long")
            .as("n_clipped_low"),
          sum(when(col("value") > col("hi"), 1L).otherwise(0L)).cast("long")
            .as("n_clipped_high"),
          sum(col("w").cast(DecimalType(18, 2))).cast("double").as("sum_w"),
          min(col("w")).as("min_w"), max(col("w")).as("max_w"))
        .orderBy("event_type")
    },
    Some("""WITH b AS (SELECT event_type,
                         quantile_cont(value, 0.05) AS lo,
                         quantile_cont(value, 0.95) AS hi
                       FROM events GROUP BY event_type),
            w AS (SELECT e.event_type, e.value, b.lo, b.hi,
                    least(greatest(e.value, b.lo), b.hi) AS w
                  FROM events e JOIN b USING (event_type))
            SELECT event_type, COUNT(*) AS n,
              CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
                AS n_clipped_low,
              CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
                AS n_clipped_high,
              CAST(SUM(CAST(w AS DECIMAL(18,2))) AS DOUBLE) AS sum_w,
              MIN(w) AS min_w, MAX(w) AS max_w
            FROM w GROUP BY event_type ORDER BY event_type"""))

  // ------------------------------------------------------------------- x150
  // Robust outlier detection via median/MAD (Iglewicz-Hoaglin modified
  // z-score): z = 0.6745·(v − median)/MAD, flag |z| > 3.5. Unlike the
  // mean/stddev z-score (x134's band), median and MAD have a 50%
  // breakdown point — the outliers being hunted cannot drag the fence,
  // which is the entire point of a data-quality monitor. Two dependent
  // percentile passes (median, then median of |v − med|) — irreducible
  // for exact MAD; same approx-sketch swap as x149 at scale. The z
  // arithmetic mirrors the oracle's expression tree exactly.
  //
  // Scale shape: two small per-type aggregations broadcast back; the flag
  // is a narrow projection; only flagged rows (rare by construction)
  // reach the output sort.
  private val x150 = GQuery(
    "x150_mad_outliers", "ext-events robust-outliers",
    (s, dir) => {
      val med = events(s, dir).groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = events(s, dir)
        .join(broadcast(med), "event_type")
        .groupBy(col("event_type"), col("med"))
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      events(s, dir)
        .join(broadcast(mad), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          (lit(0.6745) * (col("value") - col("med")) / col("mad")).as("z"))
        .where(abs(col("z")) > 3.5)
        .orderBy("event_id")
    },
    Some("""WITH med AS (SELECT event_type,
                           quantile_cont(value, 0.5) AS med
                         FROM events GROUP BY event_type),
            mad AS (SELECT e.event_type, m.med,
                      quantile_cont(abs(e.value - m.med), 0.5) AS mad
                    FROM events e JOIN med m USING (event_type)
                    GROUP BY e.event_type, m.med)
            SELECT e.event_id, e.event_type, e.value,
              0.6745 * (e.value - d.med) / d.mad AS z
            FROM events e JOIN mad d USING (event_type)
            WHERE abs(0.6745 * (e.value - d.med) / d.mad) > 3.5
            ORDER BY e.event_id"""))

  // ------------------------------------------------------------------- x151
  // Sequential-pattern mining, order 3: frequent CONSECUTIVE event-type
  // trigrams along each user's timeline — the n-gram extension of x115's
  // Markov transition matrix (bigrams tell you the next step; trigrams
  // expose the paths: view→click→purchase vs view→click→view is the
  // difference between a funnel and a bounce). Consecutive-only is the
  // deliberate scope: general gapped subsequences (PrefixSpan) explode
  // combinatorially and need a growth-pruning search, while contiguous
  // n-grams are one window pass — the right first tool on an event log.
  //
  // Scale shape: ONE hash exchange on user_id, one sort within it; both
  // lead() columns ride the same window frame (one WindowExec). The
  // trigram count then partial-aggregates — only (t1,t2,t3) triples (type
  // cardinality cubed, tiny) cross the second exchange. The min-support
  // floor mirrors association-rule mining's (x133) support threshold.
  private val x151 = GQuery(
    "x151_frequent_paths", "ext-events sequential-patterns",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("t1"))
        .withColumn("t2", lead(col("t1"), 1).over(w))
        .withColumn("t3", lead(col("t1"), 2).over(w))
        .where(col("t3").isNotNull)
        .groupBy(col("t1"), col("t2"), col("t3"))
        .agg(count(lit(1)).as("support"),
          countDistinct(col("user_id")).as("n_users"))
        .where(col("support") >= 5)
        .orderBy(desc("support"), col("t1"), col("t2"), col("t3"))
    },
    Some("""WITH seq AS (
              SELECT user_id, event_type AS t1,
                lead(event_type, 1) OVER w AS t2,
                lead(event_type, 2) OVER w AS t3
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT t1, t2, t3, COUNT(*) AS support,
              COUNT(DISTINCT user_id) AS n_users
            FROM seq WHERE t3 IS NOT NULL
            GROUP BY t1, t2, t3 HAVING COUNT(*) >= 5
            ORDER BY support DESC, t1, t2, t3"""))

  // ------------------------------------------------------------------- x152
  // HyperLogLog distinct-count sketch, hash-verified AND mergeable — the
  // x125 discipline (deterministic md5 hashing makes the approximation
  // itself cross-engine-verifiable) applied to Flajolet's HLL:
  //
  //   register = first 2 md5 hex chars (m = 256); rho = 1 + leading zero
  //   BITS of the next 8 hex chars (4·hex-zero-run + a per-char table),
  //   capped at 33 when the whole suffix is zero. Daily sketch =
  //   max(rho) per (day, register) — 256 tiny rows per day; the GLOBAL
  //   sketch is max-merge over the daily ones, which is the whole point:
  //   distinct counts don't add across days, but their HLL registers
  //   max-fold losslessly (the same algebraic-closure argument as the
  //   x141 summary, extended to a non-additive aggregate).
  //
  //   Estimate = alpha·m²/Z with Z = Σ 2^(−register). Every term is the
  //   dyadic rational 1/(1<<rho) — EXACT in a double, computed by shift
  //   and divide with no libm anywhere — and all partial sums stay inside
  //   53 mantissa bits (spread ≤ 41 bits), so the float sum is
  //   order-independent and the oracle hash-matches it bit-for-bit.
  //   Flajolet's low-range correction (raw ≤ 2.5m ∧ V>0 → linear counting
  //   m·ln(m/V), without which daily estimates here run ~2× high) DOES use
  //   ln — admitted as a one-off exception to the no-transcendentals
  //   discipline because it is finitely checkable: V is an integer in
  //   [1,256], Java Math.log and DuckDB ln were compared bitwise on all
  //   256 inputs (one 1-ulp divergence, at V=177), and the closest any
  //   256·ln(256/V) comes to a rounding boundary is 5·10⁻³ — eleven
  //   orders of magnitude above ulp noise, so round() agrees on every
  //   reachable input.
  //
  // Scale shape: one scan partial-aggregates into day×256 cells; every
  // estimate runs over sketch-sized tables. The exact countDistinct
  // columns exist only to exhibit the error — a production pipeline
  // stores the 256-row sketches and never recomputes exact counts.
  private val HllM = 256

  /** Per-row HLL register stream over the events table: one (day, user_id,
    * reg, rho) row per event — the shared derivation behind x152, the
    * streaming sketch maintainer, and any future sketch consumer.
    */
  def hllRegisterRows(ev: DataFrame): DataFrame = {
    val h = md5(col("user_id").cast("string"))
    ev.select(date_trunc("day", col("ts")).as("day"),
        col("user_id"), substring(h, 1, 2).as("reg"), substring(h, 3, 8).as("suf"))
      .withColumn("zrun", length(regexp_extract(col("suf"), "^0*", 0)))
      .withColumn("c", expr("substring(suf, zrun + 1, 1)"))
      .withColumn("rho", when(col("zrun") === 8, lit(33)).otherwise(
        lit(4) * col("zrun") + lit(1) +
          when(col("c") === "1", 3)
            .when(col("c").isin("2", "3"), 2)
            .when(col("c").isin("4", "5", "6", "7"), 1)
            .otherwise(0)))
  }

  /** (day, reg) -> max rho: the daily 256-register sketch table. */
  def hllDailySketch(ev: DataFrame): DataFrame =
    hllRegisterRows(ev).groupBy(col("day"), col("reg"))
      .agg(max(col("rho")).as("mr"))

  /** Max-merge already-aggregated sketch rows back to one row per
    * (day, reg) — the HLL analogue of [[Lakehouse.mergeSummaries]]:
    * order-free, so incremental maintenance is bit-identical to a full
    * rebuild.
    */
  def hllMergeSketches(parts: DataFrame): DataFrame =
    parts.groupBy(col("day"), col("reg")).agg(max(col("mr")).as("mr"))

  /** Estimate distinct counts from a register table, optionally grouped;
    * adds `est_n` (the x152 estimator: exact dyadic sums + the
    * finitely-checked ln correction).
    */
  def hllEstimate(sk: DataFrame, keys: Seq[String]): DataFrame = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    val grouped = if (keys.isEmpty) sk.groupBy() else sk.groupBy(keys.map(col): _*)
    grouped
      .agg(expr("sum(cast(1 as double) / cast(shiftleft(cast(1 as bigint), mr) as double))")
          .as("z_present"),
        count(lit(1)).as("present"))
      .withColumn("vzero", lit(HllM) - col("present"))
      .withColumn("raw",
        alpha * lit(HllM) * lit(HllM) / (col("z_present") + col("vzero")))
      .withColumn("est_n",
        when(col("raw") <= lit(2.5 * HllM) && col("vzero") > 0,
          round(lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("vzero").cast("double")), 0))
          .otherwise(round(col("raw"), 0))
          .cast("long"))
  }

  def hllDistinct(ev: DataFrame): DataFrame = {
    val rows = hllRegisterRows(ev)
    val daily = hllDailySketch(ev)
      .localCheckpoint(true) // the stored artifact: day x 256 registers
    def estimate(sk: DataFrame, keys: Seq[String]): DataFrame =
      hllEstimate(sk, keys)
    val perDay = estimate(daily, Seq("day"))
      .join(rows.groupBy("day").agg(countDistinct(col("user_id")).as("exact_n")), "day")
    val merged = daily.groupBy(col("reg")).agg(max(col("mr")).as("mr"))
    val global = estimate(merged, Nil)
      .crossJoin(broadcast(ev.agg(countDistinct(col("user_id")).as("exact_n"))))
      .withColumn("day", lit(null).cast("timestamp"))
    perDay.unionByName(global.select(perDay.columns.map(col): _*))
      .select(col("day"), col("exact_n"), col("est_n"),
        (col("est_n") - col("exact_n")).as("err_n"))
      .orderBy(col("day"))
  }

  private val x152 = GQuery(
    "x152_hll_distinct", "ext-events sketch hyperloglog mergeable",
    (s, dir) => hllDistinct(events(s, dir)),
    Some("""WITH r AS (
              SELECT date_trunc('day', ts) AS day, user_id,
                substr(md5(CAST(user_id AS VARCHAR)), 1, 2) AS reg,
                substr(md5(CAST(user_id AS VARCHAR)), 3, 8) AS suf
              FROM events),
            rr AS (
              SELECT day, user_id, reg,
                CASE WHEN length(regexp_extract(suf, '^0*')) = 8 THEN 33
                  ELSE 4 * length(regexp_extract(suf, '^0*')) + 1 +
                    CASE substr(suf, length(regexp_extract(suf, '^0*')) + 1, 1)
                      WHEN '1' THEN 3
                      WHEN '2' THEN 2 WHEN '3' THEN 2
                      WHEN '4' THEN 1 WHEN '5' THEN 1
                      WHEN '6' THEN 1 WHEN '7' THEN 1
                      ELSE 0 END
                  END AS rho
              FROM r),
            daily AS (
              SELECT day, reg, MAX(rho) AS mr FROM rr GROUP BY day, reg),
            est_day AS (
              SELECT day,
                SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE))
                  AS z_present,
                CAST(COUNT(*) AS BIGINT) AS present
              FROM daily GROUP BY day),
            exact_day AS (
              SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_n
              FROM r GROUP BY day),
            merged AS (SELECT reg, MAX(mr) AS mr FROM daily GROUP BY reg),
            est_all AS (
              SELECT SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE))
                  AS z_present,
                CAST(COUNT(*) AS BIGINT) AS present
              FROM merged),
            exact_all AS (
              SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_n FROM events),
            est_day2 AS (
              SELECT day, 256 - present AS vzero,
                0.7213 / (1.0 + 1.079 / 256.0) * 256 * 256
                  / (z_present + (256 - present)) AS raw
              FROM est_day),
            est_all2 AS (
              SELECT 256 - present AS vzero,
                0.7213 / (1.0 + 1.079 / 256.0) * 256 * 256
                  / (z_present + (256 - present)) AS raw
              FROM est_all),
            uni AS (
              SELECT e.day, x.exact_n,
                CAST(CASE WHEN e.raw <= 640.0 AND e.vzero > 0
                  THEN round(256.0 * ln(256.0 / e.vzero), 0)
                  ELSE round(e.raw, 0) END AS BIGINT) AS est_n
              FROM est_day2 e JOIN exact_day x USING (day)
              UNION ALL
              SELECT CAST(NULL AS TIMESTAMP), x.exact_n,
                CAST(CASE WHEN e.raw <= 640.0 AND e.vzero > 0
                  THEN round(256.0 * ln(256.0 / e.vzero), 0)
                  ELSE round(e.raw, 0) END AS BIGINT)
              FROM est_all2 e CROSS JOIN exact_all x)
            SELECT day, exact_n, est_n, est_n - exact_n AS err_n
            FROM uni ORDER BY day"""))

  // ------------------------------------------------------------------- x153
  // The native HLL aggregate ([[graft.functions.HllDistinctAgg]] — the
  // engine's first TypedImperativeAggregate) on the Verify surface: per
  // event_type distinct users, estimated by the 256-byte sketch inside
  // ObjectHashAggregate and verified BY HASH against a DuckDB oracle that
  // re-derives the very same registers and estimator relationally — a
  // custom imperative aggregate whose approximate output is
  // oracle-checkable bit-for-bit, because its merge is order-free
  // (bytewise max) and its estimator is the x152 dyadic/checked-ln
  // arithmetic. HllAggSpec holds the operator-level gates (partitioning
  // invariance, SQL-surface parity, aggregate ≡ relational twin).
  //
  // Scale shape: the whole aggregation state is 256 bytes per group —
  // partials ship sketches, not members; contrast countDistinct's
  // expand-and-shuffle of every (group, user) pair, present here only to
  // exhibit the error column.
  private val x153 = GQuery(
    "x153_hll_by_type", "ext-events sketch custom-imperative-aggregate",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(graft.functions.HllAggregate.hllDistinct(col("user_id")).as("est_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"), col("est_users"),
          (col("est_users") - col("exact_users")).as("err_users"))
        .orderBy("event_type"),
    Some("""WITH r AS (
              SELECT event_type, user_id,
                substr(md5(CAST(user_id AS VARCHAR)), 1, 2) AS reg,
                substr(md5(CAST(user_id AS VARCHAR)), 3, 8) AS suf
              FROM events),
            rr AS (
              SELECT event_type, user_id, reg,
                CASE WHEN length(regexp_extract(suf, '^0*')) = 8 THEN 33
                  ELSE 4 * length(regexp_extract(suf, '^0*')) + 1 +
                    CASE substr(suf, length(regexp_extract(suf, '^0*')) + 1, 1)
                      WHEN '1' THEN 3
                      WHEN '2' THEN 2 WHEN '3' THEN 2
                      WHEN '4' THEN 1 WHEN '5' THEN 1
                      WHEN '6' THEN 1 WHEN '7' THEN 1
                      ELSE 0 END
                  END AS rho
              FROM r),
            sk AS (SELECT event_type, reg, MAX(rho) AS mr
                   FROM rr GROUP BY event_type, reg),
            est0 AS (
              SELECT event_type,
                SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE))
                  AS z_present,
                CAST(COUNT(*) AS BIGINT) AS present
              FROM sk GROUP BY event_type),
            est AS (
              SELECT event_type, 256 - present AS vzero,
                0.7213 / (1.0 + 1.079 / 256.0) * 256 * 256
                  / (z_present + (256 - present)) AS raw
              FROM est0),
            exact AS (
              SELECT event_type,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
              FROM events GROUP BY event_type)
            SELECT x.event_type, x.exact_users,
              CAST(CASE WHEN e.raw <= 640.0 AND e.vzero > 0
                THEN round(256.0 * ln(256.0 / e.vzero), 0)
                ELSE round(e.raw, 0) END AS BIGINT) AS est_users,
              CAST(CASE WHEN e.raw <= 640.0 AND e.vzero > 0
                THEN round(256.0 * ln(256.0 / e.vzero), 0)
                ELSE round(e.raw, 0) END AS BIGINT) - x.exact_users AS err_users
            FROM est e JOIN exact x USING (event_type)
            ORDER BY x.event_type"""))

  // ------------------------------------------------------------------- x156
  // ANALYZE-style table statistics in ONE pass: per column, row count,
  // null count, HLL NDV estimate (the x153 native aggregate), and the
  // exact NDV alongside for the honest error — the stats a cost-based
  // optimizer feeds on (ndv drives join-order and aggregation-strategy
  // choices; Spark's own ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS
  // collects exactly this triple). All twelve measures ride a single
  // aggregation over a single scan, then unpivot via stack() to one row
  // per column.
  //
  // Column scope: long/string columns only — CAST(double AS STRING)
  // formats differ across engines (scientific notation thresholds), so a
  // double column's md5-register stream would diverge from the oracle;
  // a production caller hashes doubles by their IEEE bits instead.
  //
  // Scale shape: one scan, one partial-aggregated reduction to a single
  // row (three 256-byte sketches + six longs), a 3-row stack — the whole
  // operator ships O(1) bytes regardless of table size, vs countDistinct
  // alone expanding one row per (column, value) pair into its exchange.
  private val x156 = GQuery(
    "x156_table_stats", "ext-serving analyze-column-stats",
    (s, dir) => {
      val cols = Seq("event_id", "user_id", "event_type")
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"${c}_nulls"),
        graft.functions.HllAggregate.hllDistinct(col(c)).as(s"${c}_ndv_est"),
        countDistinct(col(c)).as(s"${c}_ndv")))
      val one = events(s, dir).agg(aggs.head, aggs.tail: _*)
      val stackExpr = cols.map(c =>
        s"'$c', ${c}_nulls, ${c}_ndv_est, ${c}_ndv").mkString(
        s"stack(${cols.length}, ", ", ", ") AS (col_name, n_nulls, ndv_est, ndv_exact)")
      one.selectExpr("n_rows", stackExpr)
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          col("ndv_est"), col("ndv_exact"),
          (col("ndv_est") - col("ndv_exact")).as("ndv_err"))
        .orderBy("col_name")
    },
    Some {
      def hllBlock(c: String) =
        s"""SELECT '$c' AS col_name,
              (SELECT COUNT(*) FROM events) AS n_rows,
              (SELECT CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               FROM events) AS n_nulls,
              (WITH r AS (
                 SELECT substr(md5(CAST($c AS VARCHAR)), 1, 2) AS reg,
                   substr(md5(CAST($c AS VARCHAR)), 3, 8) AS suf
                 FROM events WHERE $c IS NOT NULL),
               rr AS (
                 SELECT reg,
                   CASE WHEN length(regexp_extract(suf, '^0*')) = 8 THEN 33
                     ELSE 4 * length(regexp_extract(suf, '^0*')) + 1 +
                       CASE substr(suf, length(regexp_extract(suf, '^0*')) + 1, 1)
                         WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                         WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                         WHEN '7' THEN 1 ELSE 0 END
                     END AS rho
                 FROM r),
               sk AS (SELECT reg, MAX(rho) AS mr FROM rr GROUP BY reg),
               e0 AS (SELECT
                   SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE))
                     AS z, CAST(COUNT(*) AS BIGINT) AS present FROM sk),
               e1 AS (SELECT 256 - present AS vzero,
                   0.7213 / (1.0 + 1.079 / 256.0) * 256 * 256
                     / (z + (256 - present)) AS raw FROM e0)
               SELECT CAST(CASE WHEN raw <= 640.0 AND vzero > 0
                 THEN round(256.0 * ln(256.0 / vzero), 0)
                 ELSE round(raw, 0) END AS BIGINT) FROM e1) AS ndv_est,
              (SELECT CAST(COUNT(DISTINCT $c) AS BIGINT) FROM events) AS ndv_exact"""
      Seq("event_id", "user_id", "event_type").map(hllBlock)
        .mkString("SELECT col_name, n_rows, n_nulls, ndv_est, ndv_exact, " +
          "ndv_est - ndv_exact AS ndv_err FROM (",
          " UNION ALL ", ") ORDER BY col_name")
    })

  // ------------------------------------------------------------------- x161
  // Classical seasonal decomposition of the daily volume series —
  // n = trend + seasonal + residual, the additive moving-average
  // decomposition (the core of STL without loess): trend = centered
  // 7-day mean, seasonal = per-day-of-week mean of the detrended series,
  // residual = the rest. This is the series the x134/x137 monitors
  // alarm on, factored so a weekly rhythm stops masquerading as drift.
  //
  // Exactness discipline: every mean is ONE division of exact integers —
  // trend = sum7/7 (interior days only, so the window is always full),
  // seasonal = Σ(7·n − sum7)/(7·k) with the numerator accumulated as an
  // exact integer BEFORE the only division — so no float sum ever
  // reassociates and the doubles hash-match the oracle bit-for-bit
  // (the engine's no-float-reassociation discipline, x148's trick
  // applied to time series).
  //
  // Scale shape: one scan to day-grain counts; every window/group below
  // runs on the tiny day-domain table (the x134 rollup shape).
  private val x161 = GQuery(
    "x161_seasonal_decompose", "ext-events time-series-decomposition",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val trended = daily
        .withColumn("w_n", count(lit(1)).over(w7))
        .withColumn("sum7", sum(col("n")).over(w7))
        .where(col("w_n") === 7) // interior days: full window only
        .withColumn("dow", dayofweek(col("day")))
        .withColumn("detr7", lit(7) * col("n") - col("sum7")) // 7x detrended, exact
      val seasonal = trended.groupBy(col("dow"))
        .agg(sum(col("detr7")).cast("long").as("s_num"),
          count(lit(1)).as("k"))
      trended.join(broadcast(seasonal), "dow")
        .select(col("day"), col("n"),
          (col("sum7").cast("double") / 7.0).as("trend"),
          (col("s_num").cast("double") / (lit(7.0) * col("k").cast("double")))
            .as("seasonal"))
        .withColumn("residual",
          col("n").cast("double") - col("trend") - col("seasonal"))
        .orderBy("day")
    },
    Some("""WITH daily AS (
              SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1),
            win AS (
              SELECT day, n,
                COUNT(*) OVER w AS w_n,
                CAST(SUM(n) OVER w AS BIGINT) AS sum7
              FROM daily
              WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
            interior AS (
              SELECT day, n, sum7, dayofweek(day) AS dow,
                7 * n - sum7 AS detr7
              FROM win WHERE w_n = 7),
            seas AS (
              SELECT dow, CAST(SUM(detr7) AS BIGINT) AS s_num,
                CAST(COUNT(*) AS BIGINT) AS k
              FROM interior GROUP BY dow)
            SELECT i.day, i.n,
              CAST(i.sum7 AS DOUBLE) / 7.0 AS trend,
              CAST(s.s_num AS DOUBLE) / (7.0 * CAST(s.k AS DOUBLE)) AS seasonal,
              CAST(i.n AS DOUBLE) - (CAST(i.sum7 AS DOUBLE) / 7.0)
                - (CAST(s.s_num AS DOUBLE) / (7.0 * CAST(s.k AS DOUBLE)))
                AS residual
            FROM interior i JOIN seas s USING (dow)
            ORDER BY i.day"""))

  // ------------------------------------------------------------------- x162
  // Histogram-as-materialized-view: per (event_type, cent-quantized
  // value) counts are a MERGEABLE summary (counts add — the x141
  // algebra) that serves EXACT quantiles of the quantized distribution
  // without a fact scan: p50/p90/p99 fall out of the cumulative count by
  // rank selection (rank = ceil(p·n), the x116/x118 discrete-rank
  // discipline — integers end to end, no interpolation, no floats). This
  // is how production systems actually serve percentile dashboards
  // (histogram buckets + rank walk), here with the histogram itself and
  // the served quantiles both hash-verified.
  //
  // Scale shape: one fact scan partial-aggregates to the (type × distinct
  // cents) histogram; the rank walk is a window over the histogram only.
  // Cent quantization bounds the histogram domain; a production variant
  // widens buckets adaptively (the t-digest trade), losing exactness —
  // this form keeps it and states the domain cost instead.
  private val x162 = GQuery(
    "x162_histogram_quantile_mv", "ext-events histogram-mv exact-quantiles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hist = events(s, dir)
        .groupBy(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cent"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("cent"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
      val ranked = hist
        .withColumn("cum", sum(col("cnt")).over(w).cast("long"))
        .withColumn("n", sum(col("cnt")).over(wAll).cast("long"))
      def q(p: Int) = min(when(col("cum") * 100 >= col("n") * p, col("cent")))
      ranked.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          q(50).as("p50_cent"), q(90).as("p90_cent"), q(99).as("p99_cent"),
          count(lit(1)).as("n_buckets"))
        .orderBy("event_type")
    },
    Some("""WITH hist AS (
              SELECT event_type,
                CAST(round(value * 100, 0) AS BIGINT) AS cent,
                CAST(COUNT(*) AS BIGINT) AS cnt
              FROM events GROUP BY 1, 2),
            ranked AS (
              SELECT event_type, cent, cnt,
                CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY cent
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
              FROM hist)
            SELECT event_type, MAX(n) AS n,
              MIN(CASE WHEN cum * 100 >= n * 50 THEN cent END) AS p50_cent,
              MIN(CASE WHEN cum * 100 >= n * 90 THEN cent END) AS p90_cent,
              MIN(CASE WHEN cum * 100 >= n * 99 THEN cent END) AS p99_cent,
              COUNT(*) AS n_buckets
            FROM ranked GROUP BY event_type ORDER BY event_type"""))

  // ------------------------------------------------------------------- x163
  // Sliding-window distinct users from the DAILY register tables: a
  // 7-day trailing window's sketch is just the max-merge of its days'
  // sketches (x152's artifact re-used — no fact re-scan, no per-window
  // state), estimated with the same verified estimator; the exact
  // windowed countDistinct rides along for the honest error. THE point
  // of mergeable sketches: one daily artifact answers every window after
  // the fact — tumbling, sliding, calendar — by re-merge.
  //
  // Scale shape: the range join runs sketch-rows × 7 (day-domain sized);
  // the audit column is the expensive one (windowed exact distinct,
  // fact-scan per window) and exists only to print the error.
  private val x163 = GQuery(
    "x163_sliding_distinct", "ext-events sketch sliding-window",
    (s, dir) => {
      val daily = hllDailySketch(events(s, dir)).localCheckpoint(true)
      val days = daily.select(col("day")).distinct()
      val windowed = days.as("w")
        .join(daily.as("s"),
          col("s.day") >= date_sub(col("w.day"), 6) &&
            col("s.day") <= col("w.day"))
        .groupBy(col("w.day").as("day"), col("s.reg").as("reg"))
        .agg(max(col("s.mr")).as("mr"))
      val est = hllEstimate(windowed, Seq("day")).select(col("day"), col("est_n"))
      val exact = events(s, dir).as("e")
        .join(days.as("w"),
          date_trunc("day", col("e.ts")) >= date_sub(col("w.day"), 6) &&
            date_trunc("day", col("e.ts")) <= col("w.day"))
        .groupBy(col("w.day").as("day"))
        .agg(countDistinct(col("user_id")).as("exact_n"))
      est.join(exact, "day")
        .select(col("day"), col("exact_n"), col("est_n"),
          (col("est_n") - col("exact_n")).as("err_n"))
        .orderBy("day")
    },
    Some("""WITH r AS (
              SELECT date_trunc('day', ts) AS day, user_id,
                substr(md5(CAST(user_id AS VARCHAR)), 1, 2) AS reg,
                substr(md5(CAST(user_id AS VARCHAR)), 3, 8) AS suf
              FROM events),
            rr AS (
              SELECT day, reg,
                CASE WHEN length(regexp_extract(suf, '^0*')) = 8 THEN 33
                  ELSE 4 * length(regexp_extract(suf, '^0*')) + 1 +
                    CASE substr(suf, length(regexp_extract(suf, '^0*')) + 1, 1)
                      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                      WHEN '7' THEN 1 ELSE 0 END
                  END AS rho
              FROM r),
            daily AS (SELECT day, reg, MAX(rho) AS mr FROM rr GROUP BY day, reg),
            days AS (SELECT DISTINCT day FROM daily),
            windowed AS (
              SELECT w.day AS day, s.reg, MAX(s.mr) AS mr
              FROM days w JOIN daily s
                ON s.day >= w.day - INTERVAL 6 DAY AND s.day <= w.day
              GROUP BY w.day, s.reg),
            e0 AS (
              SELECT day,
                SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE))
                  AS z, CAST(COUNT(*) AS BIGINT) AS present
              FROM windowed GROUP BY day),
            e1 AS (SELECT day, 256 - present AS vzero,
                0.7213 / (1.0 + 1.079 / 256.0) * 256 * 256
                  / (z + (256 - present)) AS raw FROM e0),
            est AS (SELECT day,
                CAST(CASE WHEN raw <= 640.0 AND vzero > 0
                  THEN round(256.0 * ln(256.0 / vzero), 0)
                  ELSE round(raw, 0) END AS BIGINT) AS est_n FROM e1),
            exact AS (
              SELECT w.day AS day,
                CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_n
              FROM days w JOIN events e
                ON date_trunc('day', e.ts) >= w.day - INTERVAL 6 DAY
               AND date_trunc('day', e.ts) <= w.day
              GROUP BY w.day)
            SELECT est.day, exact.exact_n, est.est_n,
              est.est_n - exact.exact_n AS err_n
            FROM est JOIN exact USING (day) ORDER BY est.day"""))

  // ------------------------------------------------------------------- x164
  // Autocorrelation function of the daily volume series, lags 1..7 — the
  // seasonality detector that tells x161 WHICH period to decompose (a
  // weekly rhythm shows as a lag-7 peak). Exactness discipline: the x46
  // "log-free rational form" applied to Pearson — the engine emits the
  // EXACT integer components (num = n·Σxy − Σx·Σy, den_x = n·Σx² − (Σx)²,
  // den_y likewise), accumulated as BIGINTs so no float sum ever
  // reassociates, and derives acf with exactly one sqrt·sqrt·divide tail
  // on those exact inputs — a fixed IEEE op sequence both engines execute
  // identically, so even the double hash-verifies (x161's discipline).
  //
  // Scale shape: one fact scan to day-grain counts; the lag lattice
  // (LEAD per lag over the tiny day-domain table) and the per-lag rollup
  // never touch event rows — the x134/x161 "tiny aggregate" shape.
  def autocorrelation(ev: DataFrame, maxLag: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("day"))
    // all maxLag leads share ONE window ordering, and the lag lattice is a
    // stack() generator over those columns — one fact scan, one day-domain
    // sort, where the naive per-lag union re-scans the facts maxLag times
    // (PlanSpec pins the single scan)
    val withLeads = daily.select(
      col("n").as("x") +:
        (1 to maxLag).map(k => lead(col("n"), k).over(w).as(s"y$k")): _*)
    val stackArgs = (1 to maxLag).map(k => s"${k}L, y$k").mkString(", ")
    val lagged = withLeads
      .select(col("x"),
        expr(s"stack($maxLag, $stackArgs) AS (lag, y)"))
      .where(col("y").isNotNull)
    lagged.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lag"), col("n_pairs"),
        (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n_pairs") * col("sxx") - col("sx") * col("sx")).as("den_x"),
        (col("n_pairs") * col("syy") - col("sy") * col("sy")).as("den_y"))
      .withColumn("acf", col("num").cast("double") /
        (sqrt(col("den_x").cast("double")) * sqrt(col("den_y").cast("double"))))
      .orderBy("lag")
  }

  private val x164 = GQuery(
    "x164_autocorrelation", "ext-events time-series-acf",
    (s, dir) => autocorrelation(events(s, dir), maxLag = 7),
    Some("""WITH daily AS (
              SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1),
            lattice AS (
              SELECT k.lag, d.n AS x,
                LEAD(d.n, CAST(k.lag AS INTEGER)) OVER (PARTITION BY k.lag ORDER BY d.day) AS y
              FROM daily d CROSS JOIN
                (SELECT CAST(r.range AS BIGINT) AS lag FROM range(1, 8) r) k),
            comp AS (
              SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                CAST(SUM(x * y) AS BIGINT) AS sxy,
                CAST(SUM(x * x) AS BIGINT) AS sxx,
                CAST(SUM(y * y) AS BIGINT) AS syy
              FROM lattice WHERE y IS NOT NULL GROUP BY lag)
            SELECT lag, n_pairs,
              n_pairs * sxy - sx * sy AS num,
              n_pairs * sxx - sx * sx AS den_x,
              n_pairs * syy - sy * sy AS den_y,
              CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
                (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) *
                 sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS acf
            FROM comp ORDER BY lag"""))

  // ------------------------------------------------------------------- x165
  // Single-changepoint detection (AMOC) on the daily volume series by the
  // centered-cumulative-sum statistic: D_t = N·C_t − t·S (C_t = running
  // volume, S = total, N = days) is the CUSUM deviation scaled by N so it
  // stays an exact integer — argmax |D_t| is the classic at-most-one-
  // changepoint estimator (Page 1954 / Hinkley 1970). No recurrence
  // needed: unlike x137's EWMA, the statistic is a pure window cumsum, so
  // the whole series is window-expressible and hash-verifies exactly.
  //
  // Scale shape: one fact scan to day grain; cumsum + global argmax run
  // on the day-domain table. The single unpartitioned window is
  // domain-sized (≤ a few thousand rows for years of days), never
  // fact-sized.
  def changepoint(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the totals (N, S) come from a full-frame window over the SAME
    // single-partition day-domain sort the cumsum already paid for — no
    // second fact derivation, no join (PlanSpec pins the single scan)
    val wAll = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val stats = daily
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("nn", count(lit(1)).over(wAll))
      .withColumn("s", sum(col("n")).over(wAll))
    stats
      .withColumn("d_stat", col("nn") * col("cum_n") - col("t") * col("s"))
      .withColumn("abs_d", abs(col("d_stat")))
      .withColumn("is_changepoint",
        row_number().over(Window.orderBy(col("abs_d").desc, col("day"))) === 1)
      .select(col("day"), col("n"), col("cum_n"), col("d_stat"),
        col("is_changepoint"))
      .orderBy("day")
  }

  private val x165 = GQuery(
    "x165_changepoint", "ext-events changepoint-cusum",
    (s, dir) => changepoint(events(s, dir)),
    Some("""WITH daily AS (
              SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1),
            cum AS (
              SELECT day, n,
                CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
                CAST(SUM(n) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
              FROM daily),
            tot AS (SELECT MAX(t) AS nn, MAX(cum_n) AS s FROM cum),
            d AS (
              SELECT day, n, cum_n, nn * cum_n - t * s AS d_stat
              FROM cum CROSS JOIN tot)
            SELECT day, n, cum_n, d_stat,
              ROW_NUMBER() OVER (ORDER BY abs(d_stat) DESC, day) = 1
                AS is_changepoint
            FROM d ORDER BY day"""))

  // ------------------------------------------------------------------- x166
  // Holt double exponential smoothing (level + trend) over the daily
  // volume series — the forecasting step up from x137's EWMA: the trend
  // accumulator makes the one-step-ahead forecast follow a drifting
  // series instead of lagging it. Integer discipline: state is held in
  // MICROS (×10⁶) and stepped with truncating integer division (Scala
  // Long `/` and DuckDB `//` both truncate toward zero — the trend term
  // goes negative on declines, so floor-vs-truncate is load-bearing and
  // was verified to agree), α = β = 1/4:
  //   l_t = (x_t·10⁶ + 3·(l_{t−1} + b_{t−1})) / 4
  //   b_t = ((l_t − l_{t−1}) + 3·b_{t−1}) / 4
  // init l_1 = x_1·10⁶, b_1 = 0. Like x137, the recurrence genuinely
  // depends on every prior step; the distributed discipline is the same:
  // facts partial-aggregate to the day domain in parallel, and only the
  // domain-sized fold runs in one task. The oracle replays it as a
  // recursive CTE, so the inherently-ordered operator still
  // hash-verifies bit-identically.
  def holtDailyVolume(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, Long)]
      .repartition(1).sortWithinPartitions("day")
      .mapPartitions { it =>
        var l = Long.MinValue
        var b = 0L
        it.map { case (d, n) =>
          if (l == Long.MinValue) { l = n * 1000000L; b = 0L }
          else {
            val lPrev = l
            l = (n * 1000000L + 3L * (lPrev + b)) / 4L
            b = ((l - lPrev) + 3L * b) / 4L
          }
          (d, n, l, b, l + b)
        }
      }
      .toDF("day", "n", "level_micros", "trend_micros", "forecast_micros")
      .orderBy("day")
  }

  private val x166 = GQuery(
    "x166_holt_smoothing", "ext-events forecasting sequential-recurrence",
    (s, dir) => holtDailyVolume(events(s, dir)),
    Some("""WITH RECURSIVE d AS (
              SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1),
            r AS (
              SELECT day, n,
                CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
              FROM d),
            w(i, day, n, l, lprev, b) AS (
              SELECT i, day, n, n * 1000000, CAST(NULL AS BIGINT), CAST(0 AS BIGINT)
              FROM r WHERE i = 1
              UNION ALL
              SELECT r.i, r.day, r.n,
                (r.n * 1000000 + 3 * (w.l + w.b)) // 4,
                w.l,
                (((r.n * 1000000 + 3 * (w.l + w.b)) // 4) - w.l + 3 * w.b) // 4
              FROM w JOIN r ON r.i = w.i + 1)
            SELECT day, n, l AS level_micros, b AS trend_micros,
              l + b AS forecast_micros
            FROM w ORDER BY day"""))

  // ------------------------------------------------------------------- x167
  // Point-in-time feature snapshot — the feature-store export: per user,
  // trailing-window activity features as of a cutoff (the max event ts,
  // so the snapshot is reproducible from the data alone): 7-day and
  // 30-day counts, 30-day spend in exact cents (x162's quantization, so
  // no float sum ever reassociates), distinct active types, days since
  // last activity, and the dominant event type in the window (ties to
  // the lexicographically smallest — every decision deterministic, so
  // the whole feature matrix hash-verifies).
  //
  // Scale shape: the cutoff is one tiny max() aggregate (data-dependent,
  // like x149's bounds — the second fact pass is inherent to any
  // snapshot "as of latest"); the feature pass partial-aggregates the
  // facts to the (user × type) grid in ONE user-keyed exchange, and the
  // dominant-type window + per-user rollup both reuse that clustering.
  // TTL discipline: features only ever read the trailing windows, so an
  // incremental refresh can serve this from x141-style daily summaries.
  def featureSnapshot(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cutoff = ev.groupBy().agg(max(col("ts")).as("cutoff"))
    val grid = ev.crossJoin(broadcast(cutoff))
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        sum(when(col("ts") >= col("cutoff") - expr("INTERVAL 7 DAYS"), 1L)
          .otherwise(0L)).as("n7"),
        sum(when(col("ts") >= col("cutoff") - expr("INTERVAL 30 DAYS"), 1L)
          .otherwise(0L)).as("n30"),
        sum(when(col("ts") >= col("cutoff") - expr("INTERVAL 30 DAYS"),
          col("cents")).otherwise(0L)).as("cents30"),
        max(col("ts")).as("last_ts"),
        max(col("cutoff")).as("cutoff"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("n30").desc, col("event_type"))
    grid
      .withColumn("rn", row_number().over(byUser))
      .groupBy(col("user_id"))
      .agg(sum(col("n7")).as("n_7d"), sum(col("n30")).as("n_30d"),
        sum(col("cents30")).as("cents_30d"),
        sum(when(col("n30") > 0, 1L).otherwise(0L)).as("n_types_30d"),
        datediff(date_trunc("day", max(col("cutoff"))),
          date_trunc("day", max(col("last_ts")))).cast("long")
          .as("days_since_last"),
        max(when(col("rn") === 1 && col("n30") > 0, col("event_type")))
          .as("dominant_type_30d"))
      .orderBy("user_id")
  }

  private val x167 = GQuery(
    "x167_feature_snapshot", "ext-events feature-store point-in-time",
    (s, dir) => featureSnapshot(events(s, dir)),
    Some("""WITH cut AS (SELECT MAX(ts) AS cutoff FROM events),
            grid AS (
              SELECT e.user_id, e.event_type,
                CAST(SUM(CASE WHEN e.ts >= c.cutoff - INTERVAL 7 DAY
                  THEN 1 ELSE 0 END) AS BIGINT) AS n7,
                CAST(SUM(CASE WHEN e.ts >= c.cutoff - INTERVAL 30 DAY
                  THEN 1 ELSE 0 END) AS BIGINT) AS n30,
                CAST(SUM(CASE WHEN e.ts >= c.cutoff - INTERVAL 30 DAY
                  THEN CAST(round(e.value * 100, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS cents30,
                MAX(e.ts) AS last_ts, MAX(c.cutoff) AS cutoff
              FROM events e CROSS JOIN cut c
              GROUP BY e.user_id, e.event_type),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY n30 DESC, event_type) AS rn
              FROM grid)
            SELECT user_id,
              CAST(SUM(n7) AS BIGINT) AS n_7d,
              CAST(SUM(n30) AS BIGINT) AS n_30d,
              CAST(SUM(cents30) AS BIGINT) AS cents_30d,
              CAST(SUM(CASE WHEN n30 > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_types_30d,
              CAST(date_diff('day', date_trunc('day', MAX(last_ts)),
                date_trunc('day', MAX(cutoff))) AS BIGINT) AS days_since_last,
              MAX(CASE WHEN rn = 1 AND n30 > 0 THEN event_type END)
                AS dominant_type_30d
            FROM ranked GROUP BY user_id ORDER BY user_id"""))

  // ------------------------------------------------------------------- x169
  // Equal-frequency decile binning of event values per type — feature
  // discretization (the preprocessing step behind gradient-boosted trees
  // and calibration curves). ntile(10) over the exact cent-quantized
  // value with event_id as the total-order tiebreak, so bin assignment
  // is fully deterministic and the per-bin summary hash-verifies.
  //
  // Scale shape: the window is PARTITIONED by event_type, so the sort is
  // per-type, not global; the bin summary partial-aggregates on the same
  // clustering. At 100 TB the per-type sort gives way to cut points read
  // from x162's mergeable histogram (rank-walk the cumulative counts,
  // then bin by range lookup — one scan, no sort); this exact form is
  // the oracle of that rewrite.
  def decileBins(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cent"), col("event_id"))
    ev.select(col("event_type"), col("event_id"),
      round(col("value") * 100, 0).cast("long").as("cent"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("event_type"), col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("cent")).as("lo_cent"), max(col("cent")).as("hi_cent"))
      .orderBy("event_type", "decile")
  }

  private val x169 = GQuery(
    "x169_decile_bins", "ext-events feature-discretization",
    (s, dir) => decileBins(events(s, dir)),
    Some("""WITH t AS (
              SELECT event_type, event_id,
                CAST(round(value * 100, 0) AS BIGINT) AS cent
              FROM events),
            b AS (
              SELECT event_type, cent,
                CAST(NTILE(10) OVER (PARTITION BY event_type
                  ORDER BY cent, event_id) AS BIGINT) AS decile
              FROM t)
            SELECT event_type, decile, CAST(COUNT(*) AS BIGINT) AS n,
              MIN(cent) AS lo_cent, MAX(cent) AS hi_cent
            FROM b GROUP BY event_type, decile
            ORDER BY event_type, decile"""))

  // ------------------------------------------------------------------- x171
  // Audience overlap matrix — pairwise distinct-user intersection and
  // Jaccard between event types, the segment-overlap report behind
  // audience planning and dedup-across-channels. Exact and integer
  // (jaccard in thousandths), so the full matrix hash-verifies.
  //
  // Scale shape: ONE fact scan to the distinct (user, type) membership
  // table; the intersection self-join is user-keyed (each user
  // contributes C(their types, 2) ≤ C(|types|, 2) rows — bounded by the
  // tiny type domain, never quadratic in users); the pair lattice and
  // per-type sizes are domain-sized broadcasts.
  def audienceOverlap(ev: DataFrame): DataFrame = {
    val d = ev.select(col("user_id"), col("event_type")).distinct()
      .localCheckpoint(true) // membership table: scan once, reuse thrice
    val sizes = d.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val types = sizes.select(col("event_type").as("t"))
    val lattice = types.as("x").join(types.as("y"), col("x.t") < col("y.t"))
      .select(col("x.t").as("ta"), col("y.t").as("tb"))
    val inter = d.as("a")
      .join(d.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("n_inter"))
    lattice
      .join(inter, Seq("ta", "tb"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(broadcast(sizes.select(col("event_type").as("ta"), col("n").as("n_a"))), "ta")
      .join(broadcast(sizes.select(col("event_type").as("tb"), col("n").as("n_b"))), "tb")
      .select(col("ta"), col("tb"), col("n_a"), col("n_b"), col("n_inter"),
        expr("(1000 * n_inter) div (n_a + n_b - n_inter)").as("jaccard_milli"))
      .orderBy("ta", "tb")
  }

  private val x171 = GQuery(
    "x171_audience_overlap", "ext-events audience-overlap set-similarity",
    (s, dir) => audienceOverlap(events(s, dir)),
    Some("""WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
            sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
              FROM d GROUP BY 1),
            lattice AS (
              SELECT x.event_type AS ta, y.event_type AS tb
              FROM sizes x JOIN sizes y ON x.event_type < y.event_type),
            inter AS (
              SELECT a.event_type AS ta, b.event_type AS tb,
                CAST(COUNT(*) AS BIGINT) AS n_inter
              FROM d a JOIN d b ON a.user_id = b.user_id
                AND a.event_type < b.event_type
              GROUP BY 1, 2)
            SELECT l.ta, l.tb, sa.n AS n_a, sb.n AS n_b,
              COALESCE(i.n_inter, 0) AS n_inter,
              (1000 * COALESCE(i.n_inter, 0))
                // (sa.n + sb.n - COALESCE(i.n_inter, 0)) AS jaccard_milli
            FROM lattice l
            LEFT JOIN inter i ON i.ta = l.ta AND i.tb = l.tb
            JOIN sizes sa ON sa.event_type = l.ta
            JOIN sizes sb ON sb.event_type = l.tb
            ORDER BY l.ta, l.tb"""))

  // ------------------------------------------------------------------- x172
  // The SKETCH-SERVED overlap matrix: per-type HLL register tables
  // (x152's derivation keyed by event_type), pairwise union by register
  // max-merge — including registers present in only one sketch — and
  // intersection by inclusion-exclusion est(A) + est(B) − est(A∪B),
  // paired with x171's exact intersection to exhibit the error. This is
  // how the overlap matrix actually ships at 100 TB: per-segment
  // sketches are the stored artifact (256 rows each), and ANY pair —
  // across segments, days, tenants — is answerable by merge, never by
  // re-scanning facts. Same finitely-checked estimator as x152, so the
  // whole report still hash-verifies against a relational DuckDB replay.
  //
  // Scale shape: one fact scan to the type×256 register table
  // (checkpointed artifact); everything downstream — pair lattice, union
  // merge, estimates, the error join — is sketch-domain-sized.
  def sketchOverlap(ev: DataFrame): DataFrame = {
    val h = md5(col("user_id").cast("string"))
    val regRows = ev.select(col("event_type"), col("user_id"),
        substring(h, 1, 2).as("reg"), substring(h, 3, 8).as("suf"))
      .withColumn("zrun", length(regexp_extract(col("suf"), "^0*", 0)))
      .withColumn("c", expr("substring(suf, zrun + 1, 1)"))
      .withColumn("rho", when(col("zrun") === 8, lit(33)).otherwise(
        lit(4) * col("zrun") + lit(1) +
          when(col("c") === "1", 3)
            .when(col("c").isin("2", "3"), 2)
            .when(col("c").isin("4", "5", "6", "7"), 1)
            .otherwise(0)))
    val sk = regRows.groupBy(col("event_type"), col("reg"))
      .agg(max(col("rho")).as("mr"))
      .localCheckpoint(true) // the stored artifact: type x 256 registers
    val perType = hllEstimate(sk, Seq("event_type"))
      .select(col("event_type"), col("est_n"))
    val types = sk.select(col("event_type").as("t")).distinct()
    val lattice = types.as("x").join(types.as("y"), col("x.t") < col("y.t"))
      .select(col("x.t").as("ta"), col("y.t").as("tb"))
    val unionRegs = lattice
      .join(sk, col("event_type") === col("ta") || col("event_type") === col("tb"))
      .groupBy(col("ta"), col("tb"), col("reg")).agg(max(col("mr")).as("mr"))
    val estUnion = hllEstimate(unionRegs, Seq("ta", "tb"))
      .select(col("ta"), col("tb"), col("est_n").as("est_union"))
    val exact = audienceOverlap(ev).select(col("ta"), col("tb"), col("n_inter"))
    estUnion
      .join(broadcast(perType.select(col("event_type").as("ta"), col("est_n").as("est_a"))), "ta")
      .join(broadcast(perType.select(col("event_type").as("tb"), col("est_n").as("est_b"))), "tb")
      .withColumn("est_inter", col("est_a") + col("est_b") - col("est_union"))
      .join(exact, Seq("ta", "tb"))
      .select(col("ta"), col("tb"), col("est_a"), col("est_b"),
        col("est_union"), col("est_inter"), col("n_inter").as("exact_inter"),
        (col("est_inter") - col("n_inter")).as("err_n"))
      .orderBy("ta", "tb")
  }

  private val x172 = GQuery(
    "x172_sketch_overlap", "ext-events sketch inclusion-exclusion mergeable",
    (s, dir) => sketchOverlap(events(s, dir)),
    Some("""WITH r AS (
              SELECT event_type, user_id,
                substr(md5(CAST(user_id AS VARCHAR)), 1, 2) AS reg,
                substr(md5(CAST(user_id AS VARCHAR)), 3, 8) AS suf
              FROM events),
            rr AS (
              SELECT event_type, reg,
                CASE WHEN length(regexp_extract(suf, '^0*')) = 8 THEN 33
                  ELSE 4 * length(regexp_extract(suf, '^0*')) + 1 +
                    CASE substr(suf, length(regexp_extract(suf, '^0*')) + 1, 1)
                      WHEN '1' THEN 3
                      WHEN '2' THEN 2 WHEN '3' THEN 2
                      WHEN '4' THEN 1 WHEN '5' THEN 1
                      WHEN '6' THEN 1 WHEN '7' THEN 1
                      ELSE 0 END
                  END AS rho
              FROM r),
            sk AS (SELECT event_type, reg, MAX(rho) AS mr
              FROM rr GROUP BY event_type, reg),
            e0 AS (
              SELECT event_type,
                SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE)) AS z,
                CAST(COUNT(*) AS BIGINT) AS present
              FROM sk GROUP BY event_type),
            e1 AS (SELECT event_type, 256 - present AS vzero,
                0.7213 / (1.0 + 1.079 / 256.0) * 256 * 256 / (z + (256 - present)) AS raw
              FROM e0),
            per_type AS (SELECT event_type,
                CAST(CASE WHEN raw <= 640.0 AND vzero > 0
                  THEN round(256.0 * ln(256.0 / vzero), 0)
                  ELSE round(raw, 0) END AS BIGINT) AS est_n FROM e1),
            lattice AS (
              SELECT x.event_type AS ta, y.event_type AS tb
              FROM per_type x JOIN per_type y ON x.event_type < y.event_type),
            u AS (
              SELECT l.ta, l.tb, s.reg, MAX(s.mr) AS mr
              FROM lattice l JOIN sk s
                ON s.event_type = l.ta OR s.event_type = l.tb
              GROUP BY l.ta, l.tb, s.reg),
            u0 AS (
              SELECT ta, tb,
                SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE)) AS z,
                CAST(COUNT(*) AS BIGINT) AS present
              FROM u GROUP BY ta, tb),
            u1 AS (SELECT ta, tb, 256 - present AS vzero,
                0.7213 / (1.0 + 1.079 / 256.0) * 256 * 256 / (z + (256 - present)) AS raw
              FROM u0),
            est_u AS (SELECT ta, tb,
                CAST(CASE WHEN raw <= 640.0 AND vzero > 0
                  THEN round(256.0 * ln(256.0 / vzero), 0)
                  ELSE round(raw, 0) END AS BIGINT) AS est_union FROM u1),
            d AS (SELECT DISTINCT user_id, event_type FROM events),
            inter AS (
              SELECT a.event_type AS ta, b.event_type AS tb,
                CAST(COUNT(*) AS BIGINT) AS n_inter
              FROM d a JOIN d b ON a.user_id = b.user_id
                AND a.event_type < b.event_type
              GROUP BY 1, 2)
            SELECT e.ta, e.tb, pa.est_n AS est_a, pb.est_n AS est_b,
              e.est_union, pa.est_n + pb.est_n - e.est_union AS est_inter,
              COALESCE(i.n_inter, 0) AS exact_inter,
              pa.est_n + pb.est_n - e.est_union - COALESCE(i.n_inter, 0) AS err_n
            FROM est_u e
            JOIN per_type pa ON pa.event_type = e.ta
            JOIN per_type pb ON pb.event_type = e.tb
            LEFT JOIN inter i ON i.ta = e.ta AND i.tb = e.tb
            ORDER BY e.ta, e.tb"""))

  // ------------------------------------------------------------------- x186
  // TTL retention enforcement: rows age out per a POLICY table (the
  // GDPR / storage-cost sweep every fact store schedules) — retention
  // days keyed by event type, horizon anchored to max(ts) so the query
  // is scale-free. Output is the per-type audit (kept / purged / the
  // exact horizon applied), fully oracled; the purge itself is the
  // `kept` predicate applied as an overwrite (x87's clean-apply shape).
  //
  // Scale shape: the policy is a 3-row broadcast; the decision is a
  // narrow per-row comparison folded into the scan, and the audit is
  // one type-keyed aggregation. At 100 TB with date-partitioned facts
  // the same predicate prunes whole partitions (the horizon bounds map
  // directly to partition values) — deletion becomes metadata-only for
  // all but the boundary day.
  private val x186 = GQuery(
    "x186_ttl_retention", "ext-lifecycle ttl-retention policy-sweep",
    (s, dir) => {
      import s.implicits._
      val policy = Seq(("view", 7), ("click", 14)).toDF("event_type", "ttl_days")
      val e = events(s, dir)
      val horizon = e.agg(max(col("ts")).as("now"))
      e.join(broadcast(policy), Seq("event_type"), "left_outer")
        .withColumn("ttl_days", coalesce(col("ttl_days"), lit(30)))
        .crossJoin(broadcast(horizon))
        .withColumn("pb", col("now") - expr("make_dt_interval(ttl_days)"))
        .withColumn("kept", col("ts") > col("pb"))
        .groupBy(col("event_type"), col("ttl_days"))
        .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("kept"),
          sum(when(!col("kept"), 1L).otherwise(0L)).as("purged"),
          max(col("pb")).as("purge_before"))
        .orderBy("event_type")
    },
    Some("""WITH h AS (SELECT MAX(ts) AS now FROM events),
            p AS (SELECT * FROM (VALUES ('view', 7), ('click', 14))
                    AS t(event_type, ttl_days)),
            j AS (
              SELECT e.event_type,
                COALESCE(p.ttl_days, 30) AS ttl_days,
                (e.ts > h.now - COALESCE(p.ttl_days, 30) * INTERVAL 1 DAY)
                  AS kept,
                h.now - COALESCE(p.ttl_days, 30) * INTERVAL 1 DAY AS pb
              FROM events e LEFT JOIN p ON e.event_type = p.event_type
              CROSS JOIN h)
            SELECT event_type, ttl_days,
              CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept,
              CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS purged,
              MAX(pb) AS purge_before
            FROM j GROUP BY 1, 2 ORDER BY event_type"""))

  // ------------------------------------------------------------------- x187
  // A/B experiment analysis: deterministic md5 arm assignment (the x94
  // hash-decision discipline — first hex digit's top bit picks the
  // arm, so assignment is reproducible cross-engine and independent of
  // row order), per-arm user counts and purchase-conversion rates in
  // exact thousandths, and the pooled two-proportion z statistic. The
  // z's components (the cross-multiplied numerator, pooled counts) are
  // exact BIGINTs; the double tail is a FIXED operation sequence
  // (cast → sqrt → multiply → divide, the x164 rational-form
  // discipline) so even the float column hash-verifies.
  //
  // Scale shape: one user-grain aggregation (arm + converted flag per
  // user), then a 2-row arm rollup and a 1-row final — the fact table
  // is touched once; everything after is domain-sized.
  private val x187 = GQuery(
    "x187_ab_test", "ext-analytics experiment two-proportion-z",
    (s, dir) => {
      val perUser = events(s, dir)
        .groupBy(col("user_id"))
        // threshold conversion (>= 4 purchases): per-user event counts are
        // scale-invariant in the fixture, so both arms get a real mix of
        // converters and non-converters at every SF (a >= 1 metric is
        // degenerate here — nearly every user purchases once, making the
        // pooled variance 0)
        .agg(when(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)) >= 4, 1L).otherwise(0L).as("converted"))
        .withColumn("arm",
          when(substring(md5(concat(col("user_id").cast("string"),
            lit(":ab"))), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"),
            lit("A")).otherwise(lit("B")))
      val arms = perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
      val wide = arms.groupBy()
        .agg(max(when(col("arm") === "A", col("n"))).as("n_a"),
          max(when(col("arm") === "A", col("conv"))).as("conv_a"),
          max(when(col("arm") === "B", col("n"))).as("n_b"),
          max(when(col("arm") === "B", col("conv"))).as("conv_b"))
      wide.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        expr("(1000 * conv_a) div n_a").as("rate_a_milli"),
        expr("(1000 * conv_b) div n_b").as("rate_b_milli"),
        (col("conv_a") * col("n_b") - col("conv_b") * col("n_a")).as("z_num"),
        expr("""CASE WHEN (conv_a + conv_b) = 0
                     OR (conv_a + conv_b) = (n_a + n_b) THEN NULL
                ELSE CAST(conv_a * n_b - conv_b * n_a AS DOUBLE)
                     * sqrt(CAST(n_a + n_b AS DOUBLE))
                     / sqrt(CAST((conv_a + conv_b)
                                 * ((n_a + n_b) - (conv_a + conv_b))
                                 * n_a * n_b AS DOUBLE)) END""").as("z"))
    },
    Some("""WITH u AS (
              SELECT user_id,
                CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                    THEN 1 ELSE 0 END) >= 4
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
                  AS converted
              FROM events GROUP BY user_id),
            armed AS (
              SELECT *, CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1)
                  IN ('0','1','2','3','4','5','6','7')
                THEN 'A' ELSE 'B' END AS arm
              FROM u),
            arms AS (
              SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(converted) AS BIGINT) AS conv
              FROM armed GROUP BY arm),
            w AS (
              SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
                MAX(CASE WHEN arm = 'A' THEN conv END) AS conv_a,
                MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
                MAX(CASE WHEN arm = 'B' THEN conv END) AS conv_b
              FROM arms)
            SELECT n_a, conv_a, n_b, conv_b,
              (1000 * conv_a) // n_a AS rate_a_milli,
              (1000 * conv_b) // n_b AS rate_b_milli,
              conv_a * n_b - conv_b * n_a AS z_num,
              CASE WHEN (conv_a + conv_b) = 0
                     OR (conv_a + conv_b) = (n_a + n_b) THEN NULL
                ELSE CAST(conv_a * n_b - conv_b * n_a AS DOUBLE)
                     * sqrt(CAST(n_a + n_b AS DOUBLE))
                     / sqrt(CAST((conv_a + conv_b)
                                 * ((n_a + n_b) - (conv_a + conv_b))
                                 * n_a * n_b AS DOUBLE)) END AS z
            FROM w"""))

  // ------------------------------------------------------------------- x192
  // Late-arrival completeness audit (the bitemporal question): for each
  // EVENT day, how much of its final count was already visible when the
  // day closed? Transaction time is synthesized deterministically —
  // ingest delay = (event_id mod 3) days, so a third of facts arrive
  // same-day, a third one day late, a third two days late (the
  // late-arriving-fact regime every warehouse backfill fights). Output
  // per event-day: final count, count known by end-of-day, by
  // end-of-next-day, and completeness in exact thousandths — the table
  // that calibrates both the x103 drift monitor's re-read horizon and
  // streaming watermark delays (a watermark shorter than the observed
  // arrival tail drops exactly the mass this audit quantifies).
  //
  // Scale shape: one scan; the day grid aggregates with conditional
  // sums (no self-join of facts against facts — the naive as-of-T
  // rewrite joins the fact table to a day spine; here the day-bucket
  // comparison folds into the aggregation).
  private val x192 = GQuery(
    "x192_late_arrival_audit", "ext-lifecycle bitemporal completeness",
    (s, dir) => {
      val e = events(s, dir)
        .select(to_date(col("ts")).as("event_day"),
          to_date(col("ts") + expr("make_dt_interval(event_id % 3)"))
            .as("arrival_day"))
      e.groupBy(col("event_day"))
        .agg(count(lit(1)).as("n_final"),
          sum(when(col("arrival_day") <= col("event_day"), 1L).otherwise(0L))
            .as("n_by_eod"),
          sum(when(col("arrival_day") <= date_add(col("event_day"), 1), 1L)
            .otherwise(0L)).as("n_by_next_day"))
        .select(col("event_day"), col("n_final"), col("n_by_eod"),
          col("n_by_next_day"),
          expr("(1000 * n_by_eod) div n_final").as("eod_complete_milli"),
          expr("(1000 * n_by_next_day) div n_final").as("next_day_milli"))
        .orderBy("event_day")
    },
    Some("""WITH e AS (
              SELECT CAST(ts AS DATE) AS event_day,
                CAST(ts + (event_id % 3) * INTERVAL 1 DAY AS DATE)
                  AS arrival_day
              FROM events),
            g AS (
              SELECT event_day, CAST(COUNT(*) AS BIGINT) AS n_final,
                CAST(SUM(CASE WHEN arrival_day <= event_day
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_by_eod,
                CAST(SUM(CASE WHEN arrival_day <= event_day + 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_by_next_day
              FROM e GROUP BY event_day)
            SELECT event_day, n_final, n_by_eod, n_by_next_day,
              (1000 * n_by_eod) // n_final AS eod_complete_milli,
              (1000 * n_by_next_day) // n_final AS next_day_milli
            FROM g ORDER BY event_day"""))

  // ------------------------------------------------------------------- x193
  // Activity streaks (gaps-and-islands over DAYS): per user, the longest
  // run of consecutive active days and the length of the run touching
  // their last active day — the engagement metric behind every
  // "N-day streak" product surface, and the canonical gaps-and-islands
  // rewrite: island id = day_number − dense day rank, constant within a
  // consecutive run, so streaks fall out of one GROUP BY with no
  // self-join against a calendar spine.
  //
  // Scale shape: events collapse to distinct (user, day) FIRST (the
  // only fact-sized exchange); the rank window and island rollup run on
  // the user×day grid, partitioned by user — no global sort.
  private val x193 = GQuery(
    "x193_activity_streaks", "ext-analytics gaps-and-islands streaks",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val days = events(s, dir)
        .select(col("user_id"), datediff(to_date(col("ts")),
          lit("2024-01-01").cast("date")).cast("long").as("day_no"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day_no")
      val islands = days
        .withColumn("island", col("day_no") - row_number().over(w))
        .groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("len"), max(col("day_no")).as("island_end"))
      islands.groupBy(col("user_id"))
        .agg(sum(col("len")).as("n_active_days"),
          max(col("len")).as("longest_streak"),
          max_by(col("len"), col("island_end")).as("last_streak"),
          max(col("island_end")).as("last_day_no"))
        .orderBy("user_id")
    },
    Some("""WITH days AS (
              SELECT DISTINCT user_id,
                datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_no
              FROM events),
            ranked AS (
              SELECT user_id, day_no,
                day_no - ROW_NUMBER() OVER (PARTITION BY user_id
                  ORDER BY day_no) AS island
              FROM days),
            islands AS (
              SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len,
                MAX(day_no) AS island_end
              FROM ranked GROUP BY user_id, island)
            SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
              CAST(MAX(len) AS BIGINT) AS longest_streak,
              CAST(MAX_BY(len, island_end) AS BIGINT) AS last_streak,
              MAX(island_end) AS last_day_no
            FROM islands GROUP BY user_id ORDER BY user_id"""))

  // ------------------------------------------------------------------- x194
  // Funnel latency distribution: time from a user's FIRST view to their
  // first purchase AFTER it (x49's strict-order attribution applied to
  // elapsed time), summarized as exact discrete percentiles — rank-based
  // (value at row ceil(p·n) of the sorted deltas), not interpolated, so
  // every output is an integer microsecond count that hash-verifies
  // (interpolated percentile definitions differ across engines; the
  // disc form is the one that replays).
  //
  // Scale shape: the fact table collapses to per-user (first_view,
  // first_purchase_after) in ONE conditional aggregation — min(ts)
  // filtered by type, then min(purchase ts > first view) via a second
  // conditional min over the SAME grouped pass using max_by-free
  // integer logic; the percentile machinery runs on the converted-user
  // delta table (user-sized), with one small sort.
  private val x194 = GQuery(
    "x194_funnel_latency", "ext-analytics funnel time-to-convert percentiles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perUser = events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", unix_micros(col("ts"))))
          .as("first_view"))
      val purchases = events(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pts"))
      val deltas = perUser.join(purchases, Seq("user_id"))
        .where(col("pts") >= col("first_view"))
        .groupBy(col("user_id"))
        .agg((min(col("pts")) - min(col("first_view"))).as("delta_us"))
      val w = Window.orderBy(col("delta_us"), col("user_id"))
      val ranked = deltas
        .withColumn("rk", row_number().over(w))
        .crossJoin(broadcast(deltas.agg(count(lit(1)).as("n"))))
      val ps = Seq(25, 50, 75, 90)
      ps.map { p =>
        ranked.where(col("rk") ===
            greatest(lit(1), ceil(col("n") * p / 100).cast("int")))
          .select(lit(p).as("pct"), col("delta_us"), col("n").as("n_converted"))
      }.reduce(_ unionAll _).orderBy("pct")
    },
    Some("""WITH pu AS (
              SELECT user_id,
                MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                  AS first_view
              FROM events GROUP BY user_id),
            d AS (
              SELECT p.user_id,
                MIN(epoch_us(p.ts)) - MIN(pu.first_view) AS delta_us
              FROM events p JOIN pu ON p.user_id = pu.user_id
              WHERE p.event_type = 'purchase'
                AND epoch_us(p.ts) >= pu.first_view
              GROUP BY p.user_id),
            r AS (
              SELECT delta_us,
                ROW_NUMBER() OVER (ORDER BY delta_us, user_id) AS rk,
                COUNT(*) OVER () AS n
              FROM d),
            ps AS (SELECT * FROM (VALUES (25), (50), (75), (90)) t(pct))
            SELECT pct, delta_us, n AS n_converted
            FROM ps JOIN r
              ON r.rk = GREATEST(1, CAST(CEIL(r.n * pct / 100.0) AS INT))
            ORDER BY pct"""))

  // ------------------------------------------------------------------- x197
  // Salted skewed join, EXECUTED (x106 diagnoses skew; this is the
  // treatment): a day-keyed big-big join has only ~30 distinct keys —
  // hot partitions by construction — so the left side salts its key
  // with pmod(event_id, S) and the right side replicates each row
  // across all S salt values; the join key becomes (day, salt), S× the
  // parallelism, identical semantics. The query joins same-day
  // (purchase, view) pairs and aggregates — and certifies itself: the
  // per-day pair count from the REAL salted join must equal
  // n_purchases × n_views computed independently without any join
  // (the x175 self-certifying discipline), so the oracle hash covers
  // the salting rewrite's correctness exactly.
  //
  // Scale shape: the exchange carries (day, salt) keys — the hot day is
  // spread over S reducers; replication multiplies the SMALL side by S
  // (here both sides are facts; at a real skew site you salt the side
  // with the hot keys and replicate the other). PlanAuditSpec pins the
  // salt in the join keys.
  private val Salts = 4

  private val x197 = GQuery(
    "x197_salted_join", "ext-join skew-salting executed",
    (s, dir) => {
      val e = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("event_type"), col("event_id"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("day"), pmod(col("event_id"), lit(Salts)).as("salt"))
      val views = e.where(col("event_type") === "view")
        .select(col("day"),
          explode(array((0 until Salts).map(lit(_)): _*)).as("salt"))
      val joined = purchases.join(views, Seq("day", "salt"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_pairs"))
      val expected = e.groupBy(col("day"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_p"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_v"))
        .select(col("day"), (col("n_p") * col("n_v")).as("expected_pairs"))
      joined.join(expected, Seq("day"), "full_outer")
        .select(col("day"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          col("expected_pairs"),
          (coalesce(col("n_pairs"), lit(0L)) <=> col("expected_pairs"))
            .as("salt_rewrite_holds"))
        .orderBy("day")
    },
    Some("""WITH g AS (
              SELECT CAST(ts AS DATE) AS day,
                CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_p,
                CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_v
              FROM events GROUP BY 1)
            SELECT day, n_p * n_v AS n_pairs, n_p * n_v AS expected_pairs,
              TRUE AS salt_rewrite_holds
            FROM g ORDER BY day"""))

  // ------------------------------------------------------------------- x198
  // Forecast evaluation — the backtest closing x166's loop: the one-step-
  // ahead prediction for day t is day t−1's level+trend (lag of the
  // forecast column), scored against the actual in exact micro-units:
  // absolute error per day plus the RUNNING MAE (cumulative integer sum
  // div day count — the walk-forward curve an operator watches to decide
  // whether the smoother's parameters still fit). Every value is an
  // exact integer, so the whole backtest hash-verifies through the same
  // recursive-CTE oracle that certifies the smoother itself.
  //
  // Scale shape: inherits x166's day-grain single-partition fold (facts
  // partial-aggregate to days first); the evaluation windows run on the
  // day-sized table.
  private val x198 = GQuery(
    "x198_forecast_eval", "ext-events forecasting backtest walk-forward",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("day")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      holtDailyVolume(events(s, dir))
        .withColumn("pred_micros", lag(col("forecast_micros"), 1).over(w))
        .where(col("pred_micros").isNotNull)
        .withColumn("abs_err_micros",
          abs(col("n") * 1000000L - col("pred_micros")))
        .withColumn("cum_err", sum(col("abs_err_micros")).over(cum))
        .withColumn("cum_n", count(lit(1)).over(cum))
        .withColumn("mae_so_far_micros", expr("cum_err div cum_n"))
        .select(col("day"), col("n"), col("pred_micros"),
          col("abs_err_micros"), col("mae_so_far_micros"))
        .orderBy("day")
    },
    Some("""WITH RECURSIVE d AS (
              SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1),
            r AS (
              SELECT day, n,
                CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
              FROM d),
            w(i, day, n, l, lprev, b) AS (
              SELECT i, day, n, n * 1000000, CAST(NULL AS BIGINT), CAST(0 AS BIGINT)
              FROM r WHERE i = 1
              UNION ALL
              SELECT r.i, r.day, r.n,
                (r.n * 1000000 + 3 * (w.l + w.b)) // 4,
                w.l,
                (((r.n * 1000000 + 3 * (w.l + w.b)) // 4) - w.l + 3 * w.b) // 4
              FROM w JOIN r ON r.i = w.i + 1),
            f AS (
              SELECT day, n,
                LAG(l + b) OVER (ORDER BY day) AS pred_micros
              FROM w),
            e AS (
              SELECT day, n, pred_micros,
                ABS(n * 1000000 - pred_micros) AS abs_err_micros
              FROM f WHERE pred_micros IS NOT NULL)
            SELECT day, n, pred_micros, abs_err_micros,
              CAST(SUM(abs_err_micros) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                // COUNT(*) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS mae_so_far_micros
            FROM e ORDER BY day"""))

  // ------------------------------------------------------------------- x200
  // Mergeable ANALYZE — x156's statistics made INCREMENTAL: per-shard
  // column stats (count / min / max / HLL registers over user_id) merge
  // into the table's stats without re-touching other shards — count
  // adds, min/max fold, and ndv merges by register max (x152's sketch
  // algebra), which is ASSOCIATIVE, so the merged estimate equals the
  // direct whole-table estimate EXACTLY, not approximately. That
  // identity is the self-certifying column, and it is what makes
  // per-file ANALYZE viable at 100 TB: a new file's stats fold into the
  // table's (the Delta/Iceberg stats pipeline, and the refresh path
  // [[graft.plans.StatsCbo]] would consume); nothing is ever re-scanned.
  // Fully oracled — the DuckDB replay runs both the direct and the
  // shard-merged register pipelines through x152's estimator.
  private val x200 = GQuery(
    "x200_mergeable_analyze", "ext-serving analyze-incremental stats-merge",
    (s, dir) => {
      val e = events(s, dir)
        .select(col("event_id"), col("user_id"),
          pmod(col("event_id"), lit(3)).as("shard"))
      // register rows (the x152 md5 sketch shape), tagged by shard
      val reg = e.select(col("shard"), col("user_id"),
        substring(md5(col("user_id").cast("string")), 1, 2).as("reg"),
        substring(md5(col("user_id").cast("string")), 3, 8).as("suf"))
        .withColumn("zeros", length(regexp_extract(col("suf"), "^0*", 0)))
        .withColumn("nz", expr("substr(suf, zeros + 1, 1)"))
        .withColumn("rho",
          when(col("zeros") === 8, lit(33))
            .otherwise(col("zeros") * 4 + 1 +
              when(col("nz") === "1", 3)
                .when(col("nz").isin("2", "3"), 2)
                .when(col("nz").isin("4", "5", "6", "7"), 1)
                .otherwise(0)))
      val shardRegs = reg.groupBy(col("shard"), col("reg"))
        .agg(max(col("rho")).as("mr"))
      val mergedRegs = shardRegs.groupBy(col("reg")).agg(max(col("mr")).as("mr"))
      val directRegs = reg.groupBy(col("reg")).agg(max(col("rho")).as("mr"))
      val estMerged = hllEstimate(mergedRegs, Nil).select(col("est_n").as("est_merged"))
      val estDirect = hllEstimate(directRegs, Nil).select(col("est_n").as("est_direct"))
      val shardStats = e.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), min(col("user_id")).as("mn"),
          max(col("user_id")).as("mx"))
      val merged = shardStats.agg(sum(col("n")).as("n_merged"),
        min(col("mn")).as("mn_merged"), max(col("mx")).as("mx_merged"))
      val direct = e.agg(count(lit(1)).as("n_direct"),
        min(col("user_id")).as("mn_direct"), max(col("user_id")).as("mx_direct"),
        countDistinct(col("user_id")).as("ndv_exact"))
      merged.crossJoin(broadcast(direct))
        .crossJoin(broadcast(estMerged)).crossJoin(broadcast(estDirect))
        .select(col("n_merged"), col("n_direct"), col("mn_merged"),
          col("mn_direct"), col("mx_merged"), col("mx_direct"),
          col("est_merged"), col("est_direct"), col("ndv_exact"),
          (col("n_merged") === col("n_direct") &&
            col("mn_merged") === col("mn_direct") &&
            col("mx_merged") === col("mx_direct") &&
            col("est_merged") === col("est_direct")).as("stats_merge_holds"))
    },
    Some("""WITH e AS (
              SELECT event_id, user_id, event_id % 3 AS shard FROM events),
            r AS (
              SELECT shard, user_id,
                substr(md5(CAST(user_id AS VARCHAR)), 1, 2) AS reg,
                substr(md5(CAST(user_id AS VARCHAR)), 3, 8) AS suf
              FROM e),
            rr AS (
              SELECT shard, reg,
                CASE WHEN length(regexp_extract(suf, '^0*')) = 8 THEN 33
                  ELSE 4 * length(regexp_extract(suf, '^0*')) + 1 +
                    CASE substr(suf, length(regexp_extract(suf, '^0*')) + 1, 1)
                      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                      WHEN '7' THEN 1 ELSE 0 END
                  END AS rho
              FROM r),
            shard_regs AS (
              SELECT shard, reg, MAX(rho) AS mr FROM rr GROUP BY shard, reg),
            merged_regs AS (
              SELECT reg, MAX(mr) AS mr FROM shard_regs GROUP BY reg),
            direct_regs AS (
              SELECT reg, MAX(rho) AS mr FROM rr GROUP BY reg),
            est AS (
              SELECT
                (SELECT CAST(CASE WHEN raw <= 640.0 AND vzero > 0
                   THEN round(256.0 * ln(256.0 / vzero), 0)
                   ELSE round(raw, 0) END AS BIGINT)
                 FROM (SELECT 256 - present AS vzero,
                         0.7213 / (1.0 + 1.079 / 256.0) * 256 * 256
                           / (z + (256 - present)) AS raw
                       FROM (SELECT SUM(CAST(1 AS DOUBLE) /
                               CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE)) AS z,
                               CAST(COUNT(*) AS BIGINT) AS present
                             FROM merged_regs))) AS est_merged,
                (SELECT CAST(CASE WHEN raw <= 640.0 AND vzero > 0
                   THEN round(256.0 * ln(256.0 / vzero), 0)
                   ELSE round(raw, 0) END AS BIGINT)
                 FROM (SELECT 256 - present AS vzero,
                         0.7213 / (1.0 + 1.079 / 256.0) * 256 * 256
                           / (z + (256 - present)) AS raw
                       FROM (SELECT SUM(CAST(1 AS DOUBLE) /
                               CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE)) AS z,
                               CAST(COUNT(*) AS BIGINT) AS present
                             FROM direct_regs))) AS est_direct),
            shard_stats AS (
              SELECT shard, CAST(COUNT(*) AS BIGINT) AS n,
                MIN(user_id) AS mn, MAX(user_id) AS mx
              FROM e GROUP BY shard),
            m AS (
              SELECT CAST(SUM(n) AS BIGINT) AS n_merged,
                MIN(mn) AS mn_merged, MAX(mx) AS mx_merged
              FROM shard_stats),
            d AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_direct,
                MIN(user_id) AS mn_direct, MAX(user_id) AS mx_direct,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_exact
              FROM e)
            SELECT n_merged, n_direct, mn_merged, mn_direct,
              mx_merged, mx_direct, est_merged, est_direct, ndv_exact,
              (n_merged = n_direct AND mn_merged = mn_direct AND
               mx_merged = mx_direct AND est_merged = est_direct)
                AS stats_merge_holds
            FROM m, d, est"""))

  // ------------------------------------------------------------------- x201
  // Quantile normalization — the rank transform feature pipelines apply
  // before models that assume comparable scales (and the nonparametric
  // cousin of x169's deciles): each purchase amount maps to its
  // mid-rank quantile (2·rank − 1) / (2n) within its event type, in
  // exact thousandths via average rank over cent ties (RANK + COUNT of
  // equals — ties share one score, the textbook treatment). Everything
  // is integer arithmetic until one final div, so the transform
  // hash-verifies.
  //
  // Scale shape: the window is type-partitioned (no global sort); at
  // 100 TB the same transform runs from x162's mergeable histogram
  // (rank = cumulative count at the value's bin) — this exact form is
  // that rewrite's oracle, the x162/x169 discipline.
  private val x201 = GQuery(
    "x201_quantile_normalize", "ext-analytics feature quantile-normalization",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val w = Window.partitionBy("event_type").orderBy("cents")
      val n = Window.partitionBy("event_type")
      e.withColumn("rk", rank().over(w))
        .withColumn("ties", count(lit(1)).over(
          Window.partitionBy(col("event_type"), col("cents"))))
        .withColumn("n", count(lit(1)).over(n))
        // mid-rank of the tie block: rank + (ties - 1) / 2, kept exact by
        // doubling: q_milli = 1000 * (2*(rk + (ties-1)/2) - 1) / (2n)
        //                   = 1000 * (2*rk + ties - 2) div (2n)
        .withColumn("q_milli",
          expr("(1000 * (2 * rk + ties - 2)) div (2 * n)"))
        .select(col("event_id"), col("event_type"), col("cents"),
          col("q_milli"))
        .orderBy("event_id")
    },
    Some("""WITH e AS (
              SELECT event_id, event_type,
                CAST(round(value * 100, 0) AS BIGINT) AS cents
              FROM events),
            r AS (
              SELECT event_id, event_type, cents,
                CAST(RANK() OVER (PARTITION BY event_type ORDER BY cents)
                  AS BIGINT) AS rk,
                CAST(COUNT(*) OVER (PARTITION BY event_type, cents)
                  AS BIGINT) AS ties,
                CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
              FROM e)
            SELECT event_id, event_type, cents,
              (1000 * (2 * rk + ties - 2)) // (2 * n) AS q_milli
            FROM r ORDER BY event_id"""))

  // ------------------------------------------------------------------- x203
  // AS-OF JOIN (point-in-time join, `merge_asof` semantics): every
  // purchase event picks up the LATEST view event of the same user at or
  // before its timestamp — the canonical time-series enrichment (trade ⋈
  // latest-quote, event ⋈ last-config). Spark has no asof operator; the
  // naive range join (v.ts <= p.ts, rank 1) is a per-row candidate
  // explosion quadratic in per-key event counts. The scale-safe form used
  // here is UNION + ONE per-key ordered window: tag both sides, sort by
  // (ts, side, event_id) within user — views sort before purchases at
  // equal ts, matching the inclusive `>=` asof bound — and a running
  // `max(view ts)` makes each purchase's match a row-local read. ONE
  // hash exchange on user_id total, no join at all; at 100 TB this is
  // the only shape that survives hot keys. DuckDB's native ASOF LEFT
  // JOIN replays the exact semantics as the oracle, so the operator's
  // contract — including no-prior-view NULLs and equal-ts inclusion — is
  // hash-certified rather than spec-asserted.
  private val x203 = GQuery(
    "x203_asof_join", "ext-events asof-join point-in-time",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_p"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      events(s, dir)
        .where(col("event_type").isin("view", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"),
          when(col("event_type") === "view", col("ts")).as("view_ts0"))
        .withColumn("view_ts", max(col("view_ts0")).over(w))
        .where(col("is_p") === 1)
        .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
          col("view_ts"),
          // exact integer micros: the fixture's timestamps carry
          // sub-second parts, and seconds-truncation semantics differ
          // between engines — micros don't
          (unix_micros(col("ts")) - unix_micros(col("view_ts")))
            .as("gap_micros"))
        .orderBy("event_id")
    },
    Some("""SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
              v.ts AS view_ts,
              CAST(date_diff('microsecond', v.ts, p.ts) AS BIGINT) AS gap_micros
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase') p
            ASOF LEFT JOIN
                 (SELECT user_id, ts FROM events
                  WHERE event_type = 'view') v
              ON p.user_id = v.user_id AND p.ts >= v.ts
            ORDER BY p.event_id"""))

  // ------------------------------------------------------------------- x206
  // Exact equi-depth histogram at VALUE grain — the ANALYZE artifact
  // behind [[graft.plans.StatsCbo]]'s histogram selectivity (the rule
  // consumes the approx_percentile form at registration; this query is
  // the exact, hash-certified construction): per distinct value, the
  // cumulative count BEFORE it assigns the whole value to bucket
  // (cum_before · B) div N — pure integer arithmetic, no row-level tie
  // splitting, so two engines deal identical buckets. Buckets are equal-
  // depth up to the multiplicity of boundary values (exact when values
  // are unique), and each bucket's [lo, hi] span is the selectivity
  // estimator's interpolation interval.
  //
  // Scale shape: one fact-grain aggregate to the value DOMAIN, then a
  // domain-sized cumulative window (the x106/x119 single-partition-over-
  // aggregate discipline — bounded by value quantization, never by row
  // count; unquantized domains take the GK-sketch path x135 instead).
  private val x206 = GQuery(
    "x206_equidepth_histogram", "ext-serving analyze histogram equi-depth",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val before = Window.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
      val all = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      events(s, dir)
        .groupBy(col("value")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum_before", coalesce(sum(col("cnt")).over(before), lit(0L)))
        .withColumn("total", sum(col("cnt")).over(all))
        .withColumn("bucket", expr("(cum_before * 16) div total"))
        .groupBy("bucket")
        .agg(sum(col("cnt")).as("n"), min(col("value")).as("lo"),
          max(col("value")).as("hi"))
        .orderBy("bucket")
    },
    Some("""WITH v AS (
              SELECT value, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM events GROUP BY 1),
            c AS (
              SELECT value, cnt,
                COALESCE(CAST(SUM(cnt) OVER (ORDER BY value
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) AS cum_before,
                CAST(SUM(cnt) OVER () AS BIGINT) AS total
              FROM v)
            SELECT (cum_before * 16) // total AS bucket,
              CAST(SUM(cnt) AS BIGINT) AS n, MIN(value) AS lo, MAX(value) AS hi
            FROM c GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x208
  // Per-type daily-volume TREND: exact integer ordinary least squares —
  // the closed-form slope (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over
  // (day index, daily count) pairs, reported in MICRO-counts/day. Every
  // sum is a BIGINT of integer inputs and the single division is integer
  // `div`, so an estimated regression coefficient — normally a float
  // graveyard — hash-verifies bit-identically cross-engine. This is the
  // growth/decay detector an operator reads next to x165's changepoint
  // and x166's smoother: "is error volume trending up, and how fast?".
  //
  // Scale shape: facts partial-aggregate to (type, day) — ONE exchange;
  // the regression sums are a per-type aggregate over the day-domain
  // table, and the day index baseline is a 1-row broadcast min.
  private val x208 = GQuery(
    "x208_volume_trend", "ext-events trend-regression integer-ols",
    (s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val base = daily.agg(min(col("day")).as("day0"))
      daily.crossJoin(broadcast(base))
        .withColumn("x", datediff(col("day"), col("day0")).cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("slope_micro",
          expr("(1000000 * (n_days * sxy - sx * sy)) div " +
            "(n_days * sxx - sx * sx)"))
        .select(col("event_type"), col("n_days"), col("sy").as("total"),
          col("slope_micro"))
        .orderBy("event_type")
    },
    Some("""WITH d AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                CAST(COUNT(*) AS BIGINT) AS y
              FROM events GROUP BY 1, 2),
            b AS (SELECT MIN(day) AS day0 FROM d),
            xy AS (
              SELECT event_type,
                CAST(date_diff('day', b.day0, d.day) AS BIGINT) AS x, y
              FROM d, b),
            agg AS (
              SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                CAST(SUM(x * y) AS BIGINT) AS sxy,
                CAST(SUM(x * x) AS BIGINT) AS sxx
              FROM xy GROUP BY 1)
            SELECT event_type, n_days, sy AS total,
              (1000000 * (n_days * sxy - sx * sy)) //
                (n_days * sxx - sx * sx) AS slope_micro
            FROM agg ORDER BY event_type"""))

  // ------------------------------------------------------------------- x211
  // Cross-correlation lead-lag scan: does VIEW volume lead PURCHASE
  // volume, and by how many days? For each lag in [-3, 3], the view
  // series aligns against the purchase series shifted by `lag` days and
  // the covariance numerator (n·Σxy − Σx·Σy)/n² reports in micros —
  // exact BIGINT arithmetic end to end, so a lead-lag profile (normally
  // float-fuzzy) hash-verifies. The marketing/ops question this answers
  // ("how long is the conversion delay?") reads the argmax lag.
  //
  // Scale shape: facts aggregate to (day, type) once; the lag fan-out is
  // a 7-way generator over the DAY-DOMAIN series, and the per-lag sums
  // are one aggregate over day-sized pairs.
  private val x211 = GQuery(
    "x211_lead_lag_ccf", "ext-events cross-correlation lead-lag",
    (s, dir) => {
      val v = events(s, dir).where(col("event_type") === "view")
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("vx"))
      val p = events(s, dir).where(col("event_type") === "purchase")
        .groupBy(date_trunc("day", col("ts")).cast("date").as("pday"))
        .agg(count(lit(1)).as("py"))
      v.select(col("day"), col("vx"),
          explode(sequence(lit(-3), lit(3))).as("lag"))
        .withColumn("pday", expr("date_add(day, lag)"))
        .join(p, "pday")
        .groupBy("lag")
        .agg(count(lit(1)).as("n"), sum(col("vx")).as("sx"),
          sum(col("py")).as("sy"), sum(col("vx") * col("py")).as("sxy"))
        .withColumn("cov_micro",
          expr("(1000000 * (n * sxy - sx * sy)) div (n * n)"))
        .select(col("lag").cast("int").as("lag"), col("n"), col("cov_micro"))
        .orderBy("lag")
    },
    Some("""WITH v AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS vx
              FROM events WHERE event_type = 'view' GROUP BY 1),
            p AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS pday,
                CAST(COUNT(*) AS BIGINT) AS py
              FROM events WHERE event_type = 'purchase' GROUP BY 1),
            lagged AS (
              SELECT l.lag, v.vx, p.py
              FROM v, unnest(range(-3, 4)) l(lag)
              JOIN p ON p.pday = v.day + CAST(l.lag AS INT)),
            agg AS (
              SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(vx) AS BIGINT) AS sx, CAST(SUM(py) AS BIGINT) AS sy,
                CAST(SUM(vx * py) AS BIGINT) AS sxy
              FROM lagged GROUP BY 1)
            SELECT CAST(lag AS INT) AS lag, n,
              (1000000 * (n * sxy - sx * sy)) // (n * n) AS cov_micro
            FROM agg ORDER BY lag"""))

  // ------------------------------------------------------------------- x213
  // RFM segmentation — the classic customer scoring: per user, recency
  // (days since last event, against the corpus max day), frequency
  // (event count) and monetary (exact decimal cents), each dealt into
  // quintiles 1..5 where 5 is best (most recent / most frequent /
  // highest spend), ties broken by user_id so the deal is
  // deterministic and the full segment table hash-verifies.
  //
  // Scale shape: one per-user aggregate; the quintile windows rank the
  // USER-ENTITY domain (three total-order sorts — the x169/x201
  // rank-transform shape). At corpus scale the exact ntile swaps for
  // histogram cut points (x135/x206) applied as row-local comparisons;
  // the fixture runs the exact form the oracle can replay.
  private val x213 = GQuery(
    "x213_rfm_segments", "ext-events rfm-scoring quintiles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val anchor = events(s, dir)
        .agg(max(date_trunc("day", col("ts")).cast("date")).as("day_max"))
      val perUser = events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(date_trunc("day", col("ts")).cast("date")).as("day_last"),
          count(lit(1)).as("frequency"),
          (sum(col("value").cast(DecimalType(12, 2))) * 100)
            .cast("long").as("monetary_cents"))
        .crossJoin(broadcast(anchor))
        .withColumn("recency_days",
          datediff(col("day_max"), col("day_last")).cast("long"))
      perUser
        .withColumn("rq", ntile(5).over(
          Window.orderBy(col("recency_days").desc, col("user_id"))))
        .withColumn("fq", ntile(5).over(
          Window.orderBy(col("frequency"), col("user_id"))))
        .withColumn("mq", ntile(5).over(
          Window.orderBy(col("monetary_cents"), col("user_id"))))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary_cents"), col("rq").cast("long").as("rq"),
          col("fq").cast("long").as("fq"), col("mq").cast("long").as("mq"),
          concat(col("rq"), col("fq"), col("mq")).as("segment"))
        .orderBy("user_id")
    },
    Some("""WITH a AS (
              SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS day_max
              FROM events),
            u AS (
              SELECT user_id,
                MAX(CAST(date_trunc('day', ts) AS DATE)) AS day_last,
                CAST(COUNT(*) AS BIGINT) AS frequency,
                CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
                  AS monetary_cents
              FROM events GROUP BY 1),
            r AS (
              SELECT u.user_id,
                CAST(date_diff('day', u.day_last, a.day_max) AS BIGINT)
                  AS recency_days,
                u.frequency, u.monetary_cents
              FROM u, a),
            q AS (
              SELECT *,
                NTILE(5) OVER (ORDER BY recency_days DESC, user_id) AS rq,
                NTILE(5) OVER (ORDER BY frequency, user_id) AS fq,
                NTILE(5) OVER (ORDER BY monetary_cents, user_id) AS mq
              FROM r)
            SELECT user_id, recency_days, frequency, monetary_cents,
              rq, fq, mq,
              CAST(rq AS VARCHAR) || CAST(fq AS VARCHAR) ||
                CAST(mq AS VARCHAR) AS segment
            FROM q ORDER BY user_id"""))

  // ------------------------------------------------------------------- x214
  // Theil–Sen robust trend — the median-of-pairwise-slopes estimator
  // (Sen 1968), the robust complement to x208's OLS: immune to up to
  // ~29 % outlier days (a holiday spike drags the OLS slope, not this
  // one). Slopes quantize to exact integer micros FIRST
  // ((Δy · 1e6) div Δx — deterministic), then the LOWER MEDIAN by
  // (slope, day-pair) total order — so a robust statistic that is
  // normally floating-median-fuzzy hash-verifies. Output also carries
  // x208-style OLS on the same series for side-by-side reading.
  //
  // Scale shape: the pair lattice is DAY-DOMAIN sized (d(d−1)/2 pairs
  // over the daily aggregate — the x201 domain-bound note: facts never
  // pair). The domain cross join is deliberate and bounded.
  private val x214 = GQuery(
    "x214_theil_sen", "ext-events robust-trend theil-sen",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("y"))
      val base = daily.agg(min(col("day")).as("day0"))
      val d = daily.crossJoin(broadcast(base))
        .select(datediff(col("day"), col("day0")).cast("long").as("x"),
          col("y"))
      val pairs = d.as("a").join(d.as("b"), col("b.x") > col("a.x"))
        .select(col("a.x").as("x1"), col("b.x").as("x2"),
          expr("((b.y - a.y) * 1000000) div (b.x - a.x)").as("slope_micro"))
      val n = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      pairs
        .withColumn("rn", row_number().over(
          Window.orderBy(col("slope_micro"), col("x1"), col("x2"))))
        .withColumn("n_pairs", count(lit(1)).over(n))
        .where(col("rn") === expr("(n_pairs + 1) div 2"))
        .select(col("n_pairs"), col("slope_micro").as("ts_slope_micro"))
    },
    Some("""WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS y
              FROM events GROUP BY 1),
            b AS (SELECT MIN(day) AS day0 FROM daily),
            d AS (
              SELECT CAST(date_diff('day', b.day0, daily.day) AS BIGINT) AS x, y
              FROM daily, b),
            p AS (
              SELECT a.x AS x1, bb.x AS x2,
                ((bb.y - a.y) * 1000000) // (bb.x - a.x) AS slope_micro
              FROM d a JOIN d bb ON bb.x > a.x),
            r AS (
              SELECT slope_micro,
                ROW_NUMBER() OVER (ORDER BY slope_micro, x1, x2) AS rn,
                CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs
              FROM p)
            SELECT n_pairs, slope_micro AS ts_slope_micro
            FROM r WHERE rn = (n_pairs + 1) // 2"""))

  // ------------------------------------------------------------------- x218
  // Kaplan–Meier survival — time from a user's FIRST VIEW to FIRST
  // PURCHASE in whole days, right-censored at the corpus horizon for
  // users who viewed but never purchased (the product-analytics
  // "conversion survival curve", and the canonical censored-duration
  // estimator). The product limit Ŝ(t) = Π (1 − d/n) runs as the x137
  // sequential-fold discipline with INTEGER micro-rounding per step
  // (s ← (s·(n−d)) div n), so an estimator that is normally a float
  // product hash-verifies through a recursive-CTE oracle. Output per
  // event day: at-risk n, events d, censored c leaving after t, and the
  // surviving fraction in micros.
  //
  // Scale shape: one per-user aggregate (first view / first purchase),
  // then everything runs on the DURATION-DAY domain (≤ corpus days);
  // the single-partition fold is domain-sized — the x137/x166 bound.
  /** The censored-duration risk table behind the survival pair — time
    * from first view to first purchase in whole days, right-censored at
    * the corpus horizon; per event day the at-risk count n, events d and
    * censored c. Shared by x218 (Kaplan–Meier product-limit) and x368
    * (Nelson–Aalen cumulative hazard) so the two estimators can never
    * disagree about WHO is at risk WHEN (the x31 no-drift discipline).
    * Returns (t, n_risk, d, c).
    */
  private def survivalRiskTable(s: SparkSession, dir: String): DataFrame = {
      val perUser = events(s, dir)
        .where(col("event_type").isin("view", "purchase"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view",
            date_trunc("day", col("ts")).cast("date"))).as("first_view"),
          min(when(col("event_type") === "purchase",
            date_trunc("day", col("ts")).cast("date"))).as("first_purchase"))
        .where(col("first_view").isNotNull)
      val horizon = events(s, dir)
        .agg(max(date_trunc("day", col("ts")).cast("date")).as("hmax"))
      val durations = perUser.crossJoin(broadcast(horizon))
        .select(
          when(col("first_purchase").isNotNull &&
              col("first_purchase") >= col("first_view"),
            datediff(col("first_purchase"), col("first_view")))
            .otherwise(datediff(col("hmax"), col("first_view")))
            .cast("long").as("t"),
          (col("first_purchase").isNotNull &&
            col("first_purchase") >= col("first_view")).as("converted"))
      val byDay = durations.groupBy("t")
        .agg(sum(when(col("converted"), 1L).otherwise(0L)).as("d"),
          sum(when(col("converted"), 0L).otherwise(1L)).as("c"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("t")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val all = org.apache.spark.sql.expressions.Window
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      byDay
        .withColumn("gone_before",
          coalesce(sum(col("d") + col("c")).over(w), lit(0L)))
        .withColumn("total", sum(col("d") + col("c")).over(all))
        .withColumn("n_risk", col("total") - col("gone_before"))
        .select(col("t"), col("n_risk"), col("d"), col("c"))
  }

  private val x218 = GQuery(
    "x218_kaplan_meier", "ext-events survival kaplan-meier censored",
    (s, dir) => {
      import s.implicits._
      survivalRiskTable(s, dir)
        .as[(Long, Long, Long, Long)]
        .repartition(1).sortWithinPartitions("t")
        .mapPartitions { it =>
          var sMicro = 1000000L
          it.map { case (t, n, d, c) =>
            sMicro = sMicro * (n - d) / n
            (t, n, d, c, sMicro)
          }
        }
        .toDF("t", "n_risk", "d", "c", "s_micro")
        .orderBy("t")
    },
    Some("""WITH RECURSIVE pu AS (
              SELECT user_id,
                MIN(CASE WHEN event_type = 'view'
                  THEN CAST(date_trunc('day', ts) AS DATE) END) AS first_view,
                MIN(CASE WHEN event_type = 'purchase'
                  THEN CAST(date_trunc('day', ts) AS DATE) END) AS first_purchase
              FROM events WHERE event_type IN ('view', 'purchase')
              GROUP BY 1),
            h AS (SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS hmax
                  FROM events),
            dur AS (
              SELECT CASE WHEN pu.first_purchase IS NOT NULL
                  AND pu.first_purchase >= pu.first_view
                THEN CAST(date_diff('day', pu.first_view, pu.first_purchase)
                  AS BIGINT)
                ELSE CAST(date_diff('day', pu.first_view, h.hmax) AS BIGINT)
                END AS t,
                (pu.first_purchase IS NOT NULL
                  AND pu.first_purchase >= pu.first_view) AS converted
              FROM pu, h WHERE pu.first_view IS NOT NULL),
            byday AS (
              SELECT t,
                CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS d,
                CAST(SUM(CASE WHEN converted THEN 0 ELSE 1 END) AS BIGINT) AS c
              FROM dur GROUP BY 1),
            risk AS (
              SELECT t, d, c,
                CAST(SUM(d + c) OVER () AS BIGINT)
                  - COALESCE(CAST(SUM(d + c) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS n_risk,
                CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS i
              FROM byday),
            km(i, t, n_risk, d, c, s_micro) AS (
              SELECT i, t, n_risk, d, c,
                (1000000 * (n_risk - d)) // n_risk
              FROM risk WHERE i = 1
              UNION ALL
              SELECT r.i, r.t, r.n_risk, r.d, r.c,
                (km.s_micro * (r.n_risk - r.d)) // r.n_risk
              FROM km JOIN risk r ON r.i = km.i + 1)
            SELECT t, n_risk, d, c, s_micro FROM km ORDER BY t"""))

  // ------------------------------------------------------------------- x228
  // Mann–Kendall trend test — the nonparametric SIGNIFICANCE companion to
  // x214's Theil–Sen slope (Sen estimates the trend, Mann–Kendall tests
  // whether it exists): S = Σ_{i<j} sign(y_j − y_i) over the daily series,
  // tie-corrected variance Var(S)·18 kept as the exact integer
  // n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), and the continuity-corrected
  // z-statistic quantized to millis through the x202 round-after-sqrt
  // discipline (IEEE sqrt/division are correctly rounded, so both engines
  // produce the identical double before the one round).
  //
  // Scale shape: the sign lattice is DAY-DOMAIN pairs over the daily
  // aggregate (the x214 bound — facts never pair); ties come from one
  // further aggregate over the same domain; the combine is three 1-row
  // frames.
  private val x228 = GQuery(
    "x228_mann_kendall", "ext-events trend-test mann-kendall",
    (s, dir) => {
      val daily = events(s, dir)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("y"))
        .localCheckpoint(true) // three aggregates read the day domain
      val sRow = daily.as("a").join(daily.as("b"), col("b.day") > col("a.day"))
        .agg(sum(when(col("b.y") > col("a.y"), 1L)
          .when(col("b.y") < col("a.y"), -1L).otherwise(0L)).as("s_stat"))
      val nRow = daily.agg(count(lit(1)).as("n_days"))
      val tieRow = daily.groupBy("y").agg(count(lit(1)).as("t"))
        .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L)).as("tsum"))
      sRow.crossJoin(broadcast(nRow)).crossJoin(broadcast(tieRow))
        .withColumn("var18",
          expr("n_days * (n_days - 1) * (2 * n_days + 5) - tsum"))
        .select(col("n_days"), col("s_stat"), col("var18"),
          when(col("s_stat") > 0,
            expr("cast(round((s_stat - 1) / sqrt(var18 / 18.0) * 1000, 0) as bigint)"))
            .when(col("s_stat") < 0,
              expr("cast(round((s_stat + 1) / sqrt(var18 / 18.0) * 1000, 0) as bigint)"))
            .otherwise(lit(0L)).as("z_milli"))
    },
    Some("""WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS y
              FROM events GROUP BY 1),
            sp AS (
              SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
              FROM daily a JOIN daily b ON b.day > a.day),
            np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
            tp AS (
              SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT),
                0) AS tsum
              FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
                    FROM daily GROUP BY y)),
            v AS (
              SELECT n_days, s_stat,
                n_days * (n_days - 1) * (2 * n_days + 5) - tsum AS var18
              FROM sp, np, tp)
            SELECT n_days, s_stat, var18,
              CASE WHEN s_stat > 0 THEN
                CAST(round((s_stat - 1) / sqrt(var18 / 18.0) * 1000, 0)
                  AS BIGINT)
              WHEN s_stat < 0 THEN
                CAST(round((s_stat + 1) / sqrt(var18 / 18.0) * 1000, 0)
                  AS BIGINT)
              ELSE 0 END AS z_milli
            FROM v"""))

  // ------------------------------------------------------------------- x262
  // Wald–Wolfowitz runs test — the RANDOMNESS companion to x228's trend
  // test: a series can be trend-free yet still non-random (clustered
  // regimes, alternation); dichotomize daily volume around its lower
  // median (ties to the median dropped, the standard treatment), count
  // the runs of consecutive same-side days, and compare against the
  // exact expectation 1 + 2n₁n₂/(n₁+n₂) in millis. Fewer runs than
  // expected = regime clustering (a deployment/incident signature); more
  // = oscillation (a retry storm signature). Integer end to end.
  //
  // Scale shape: one fact aggregate to the day domain, a count-domain
  // median grid, one day-ordered lag window over ≤ |days| rows — the
  // x214/x228 domain discipline throughout.
  private val x262 = GQuery(
    "x262_runs_test", "ext-events randomness-test wald-wolfowitz",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("y"))
        .localCheckpoint(true) // median grid + run scan reread the domain
      val med = daily.groupBy("y").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("tot", sum(col("c")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .where(col("cum") * 2 >= col("tot"))
        .agg(min(col("y")).as("median"))
      daily.crossJoin(broadcast(med))
        .where(col("y") =!= col("median"))
        .select(col("day"), (col("y") > col("median")).as("above"))
        .withColumn("prev", lag(col("above"), 1).over(Window.orderBy("day")))
        .agg(sum(when(col("prev").isNull || col("prev") =!= col("above"), 1L)
          .otherwise(0L)).as("runs"),
          sum(when(col("above"), 1L).otherwise(0L)).as("n1"),
          sum(when(!col("above"), 1L).otherwise(0L)).as("n2"))
        .select(col("n1"), col("n2"), coalesce(col("runs"), lit(0L)).as("runs"),
          expr("""case when n1 + n2 = 0 then -1
               else 1000 + (2000 * n1 * n2) div (n1 + n2) end""")
            .as("expected_runs_milli"))
    },
    Some("""WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS y
              FROM events GROUP BY 1),
            grid AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS c
                     FROM daily GROUP BY 1),
            mg AS (
              SELECT y,
                CAST(SUM(c) OVER (ORDER BY y
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
                CAST(SUM(c) OVER () AS BIGINT) AS tot
              FROM grid),
            med AS (SELECT MIN(y) AS median FROM mg WHERE cum * 2 >= tot),
            sg AS (SELECT day, y > med.median AS above
                   FROM daily, med WHERE y <> med.median),
            r AS (SELECT above, LAG(above) OVER (ORDER BY day) AS prev
                  FROM sg),
            m AS (
              SELECT
                CAST(SUM(CASE WHEN prev IS NULL OR prev <> above
                  THEN 1 ELSE 0 END) AS BIGINT) AS runs,
                CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                CAST(SUM(CASE WHEN NOT above THEN 1 ELSE 0 END) AS BIGINT)
                  AS n2
              FROM r)
            SELECT n1, n2, COALESCE(runs, 0) AS runs,
              CASE WHEN n1 + n2 = 0 THEN -1
                ELSE 1000 + (2000 * n1 * n2) // (n1 + n2) END
                AS expected_runs_milli
            FROM m"""))

  // ------------------------------------------------------------------- x268
  // Markov next-event backtest — x115 BUILDS the transition matrix; this
  // grades it the only way that counts: train the first-order model on
  // the first ¾ of the timeline (integer-micro split point, exact in
  // both engines), predict each held-out transition as the train-side
  // argmax (ties to the lexicographically smallest successor — the x253
  // determinism discipline), and report per-source accuracy. The honest
  // temporal split a sequence model demands — random splits leak future
  // behavior backwards. A source first seen in test predicts '(none)'
  // and scores zero, kept visible rather than dropped.
  //
  // Scale shape: one user-partitioned lag window over the fact scan (the
  // x115 shape), then everything is |type|²-domain: train counts, argmax
  // window, test counts, one broadcast-sized join. The 1-row split bound
  // rides the registry's crossJoin(broadcast(bound)) idiom.
  private val x268 = GQuery(
    "x268_markov_backtest", "ext-events sequence-model temporal-backtest",
    (s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      val bound = e.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
        .select(expr("lo + ((hi - lo) * 3) div 4").as("split_us"))
      val seq = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val pairs = e
        .withColumn("src", lag(col("event_type"), 1).over(seq))
        .where(col("src").isNotNull)
        .crossJoin(broadcast(bound))
        .select(col("src"), col("event_type").as("dst"),
          (col("us") < col("split_us")).as("is_train"))
      val train = pairs.where(col("is_train"))
        .groupBy("src", "dst").agg(count(lit(1)).as("wt"))
      val arg = Window.partitionBy("src")
        .orderBy(col("wt").desc, col("dst"))
      val pred = train.withColumn("rn", row_number().over(arg))
        .where(col("rn") === 1).select(col("src"), col("dst").as("predicted"))
      pairs.where(!col("is_train"))
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
        .join(broadcast(pred), Seq("src"), "left")
        .groupBy(col("src"),
          coalesce(col("predicted"), lit("(none)")).as("predicted"))
        .agg(sum(col("n")).as("n_test"),
          sum(when(col("dst") === coalesce(col("predicted"), lit("(none)")),
            col("n")).otherwise(0L)).as("n_correct"))
        .select(col("src"), col("predicted"), col("n_test"), col("n_correct"),
          expr("(1000 * n_correct) div n_test").as("acc_milli"))
        .orderBy("src")
    },
    Some("""WITH e AS (
              SELECT user_id, event_type, epoch_us(ts) AS us, event_id
              FROM events),
            b AS (
              SELECT MIN(us) + ((MAX(us) - MIN(us)) * 3) // 4 AS split_us
              FROM e),
            p AS (
              SELECT event_type AS dst, us,
                LAG(event_type) OVER (
                  PARTITION BY user_id ORDER BY us, event_id) AS src
              FROM e),
            pairs AS (
              SELECT src, dst, us < b.split_us AS is_train
              FROM p, b WHERE src IS NOT NULL),
            train AS (
              SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS wt
              FROM pairs WHERE is_train GROUP BY 1, 2),
            pred AS (
              SELECT src, dst AS predicted FROM (
                SELECT src, dst, ROW_NUMBER() OVER (
                  PARTITION BY src ORDER BY wt DESC, dst) AS rn
                FROM train) WHERE rn = 1),
            test AS (
              SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
              FROM pairs WHERE NOT is_train GROUP BY 1, 2),
            j AS (
              SELECT t.src, COALESCE(pr.predicted, '(none)') AS predicted,
                t.dst, t.n
              FROM test t LEFT JOIN pred pr ON pr.src = t.src)
            SELECT src, predicted, CAST(SUM(n) AS BIGINT) AS n_test,
              CAST(SUM(CASE WHEN dst = predicted THEN n ELSE 0 END)
                AS BIGINT) AS n_correct,
              (1000 * CAST(SUM(CASE WHEN dst = predicted THEN n ELSE 0 END)
                AS BIGINT)) // CAST(SUM(n) AS BIGINT) AS acc_milli
            FROM j GROUP BY 1, 2 ORDER BY 1"""))

  // ------------------------------------------------------------------- x269
  // Time-decay multi-touch attribution — x49 gives the conversion to ONE
  // touch (first strict-order funnel); production marketing/feature
  // attribution splits it across EVERY touch in the lookback window with
  // exponentially decaying credit (half-life 1 day here): weight 1000
  // div 2^age_days, normalized per conversion to micro shares, rolled up
  // by touch type. Exact integers: the halving weights and the
  // per-conversion share division are integer ops identical in both
  // engines (truncation loss stays inside each conversion, deterministic).
  //
  // Scale shape: conversions join touches USER-KEYED with a 7-day range
  // predicate — per-user-bounded fan-out, never a cartesian; one
  // conversion-keyed window for the normalizer; one |type|-domain rollup.
  private val x269 = GQuery(
    "x269_timedecay_attribution", "ext-events attribution time-decay",
    (s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      val conv = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("cus"),
          col("event_id").as("conv_id"))
      val touches = e.join(conv, Seq("user_id"))
        .where(col("us") < col("cus")
          && col("us") >= col("cus") - lit(7L * 86400000000L))
        .withColumn("w",
          expr("1000 div shiftleft(1, cast((cus - us) div 86400000000 as int))"))
      val perConv = Window.partitionBy("conv_id")
      touches
        .withColumn("tot", sum(col("w")).over(perConv))
        .withColumn("share_micro", expr("(w * 1000000) div tot"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("share_micro")).as("credit_micro"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
              SELECT user_id, event_type, epoch_us(ts) AS us, event_id
              FROM events),
            conv AS (
              SELECT user_id, us AS cus, event_id AS conv_id
              FROM e WHERE event_type = 'purchase'),
            touches AS (
              SELECT t.event_type, c.conv_id,
                1000 // (1 << CAST((c.cus - t.us) // 86400000000 AS INT))
                  AS w
              FROM e t JOIN conv c ON c.user_id = t.user_id
              WHERE t.us < c.cus AND t.us >= c.cus - 7 * 86400000000),
            sh AS (
              SELECT event_type,
                (w * 1000000) // SUM(w) OVER (PARTITION BY conv_id)
                  AS share_micro
              FROM touches)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
              CAST(SUM(share_micro) AS BIGINT) AS credit_micro
            FROM sh GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x270
  // Two-factor OLS — x208's single-regressor trend generalized to the
  // first genuinely multivariate fit: daily volume ~ intercept + b·day
  // index + c·weekend, solved EXACTLY by Cramer's rule over the 3×3
  // normal equations. OVERFLOW DISCIPLINE (round-10 ADVICE fix): at the
  // stated production scale (10⁴ days × 10¹² events/day) the y-moments
  // already exceed 2⁶³ — sty = Σt·y ≈ 5·10¹⁹ — and the Cramer
  // determinants reach ~10³² — so BIGINT is NOT exact there (Spark Long
  // wraps silently non-ANSI while DuckDB's BIGINT errors: a silent
  // cross-engine divergence). Every moment and determinant therefore
  // rides DECIMAL(38,0) on the Spark side and HUGEINT in the oracle (the
  // x235/x220 headroom discipline); 1000·det_a ≈ 10³⁵ < 10³⁸ keeps the
  // scaled ratios in range. A SINGULAR system (window of only weekdays →
  // w all zero, or a single day) makes det = 0: the `det_zero` flag is
  // emitted and the coefficients are explicitly NULL in BOTH engines
  // rather than an unguarded division. Separating the weekend dummy from
  // the trend is the point: a naive x208 trend on
  // weekday-seasonal data aliases the seasonality into slope; the
  // two-factor fit reads them apart. Milli-quantized coefficients via
  // one integer division per Cramer ratio — deterministic cross-engine.
  //
  // Scale shape: one fact aggregate to the day domain, one 9-moment
  // rollup (map-side combinable), arithmetic on a single row.
  private val x270 = GQuery(
    "x270_two_factor_ols", "ext-events regression two-factor-ols",
    (s, dir) => {
      val daily = events(s, dir)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("y"))
      val minDay = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      daily
        .withColumn("t", datediff(col("day"), min(col("day")).over(minDay))
          .cast("long"))
        .withColumn("w",
          when(dayofweek(col("day")).isin(1, 7), 1L).otherwise(0L))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("t")).cast("decimal(38,0)").as("st"),
          sum(col("w")).cast("decimal(38,0)").as("sw"),
          sum(col("t") * col("t")).cast("decimal(38,0)").as("stt"),
          sum(col("t") * col("w")).cast("decimal(38,0)").as("stw"),
          sum(col("w") * col("w")).cast("decimal(38,0)").as("sww"),
          sum(col("y")).cast("decimal(38,0)").as("sy"),
          // the in-sum cast matters: t·y alone is ~10¹⁶ per row at
          // production scale, and the BIGINT running sum is what wraps
          sum(col("t").cast("decimal(38,0)") * col("y")).as("sty"),
          sum(col("w").cast("decimal(38,0)") * col("y")).as("swy"))
        .select(col("n"),
          expr("""n * (stt * sww - stw * stw) - st * (st * sww - stw * sw)
               + sw * (st * stw - stt * sw)""").as("det"),
          expr("""sy * (stt * sww - stw * stw) - st * (sty * sww - stw * swy)
               + sw * (sty * stw - stt * swy)""").as("det_a"),
          expr("""n * (sty * sww - stw * swy) - sy * (st * sww - stw * sw)
               + sw * (st * swy - sty * sw)""").as("det_b"),
          expr("""n * (stt * swy - sty * stw) - st * (st * swy - sty * sw)
               + sy * (st * stw - stt * sw)""").as("det_c"))
        .select(col("n").cast("long").as("n_days"),
          when(col("det") === 0, lit(1L)).otherwise(lit(0L)).as("det_zero"),
          when(col("det") =!= 0,
            expr("(1000 * det_a) div det")).as("intercept_milli"),
          when(col("det") =!= 0,
            expr("(1000 * det_b) div det")).as("slope_milli"),
          when(col("det") =!= 0,
            expr("(1000 * det_c) div det")).as("weekend_milli"))
    },
    Some("""WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS y
              FROM events GROUP BY 1),
            f AS (
              SELECT CAST(datediff('day', MIN(day) OVER (), day) AS BIGINT)
                  AS t,
                CASE WHEN dayofweek(day) IN (0, 6) THEN 1 ELSE 0 END AS w,
                y
              FROM daily),
            m AS (
              SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                CAST(SUM(t) AS HUGEINT) AS st,
                CAST(SUM(w) AS HUGEINT) AS sw,
                CAST(SUM(t * t) AS HUGEINT) AS stt,
                CAST(SUM(t * w) AS HUGEINT) AS stw,
                CAST(SUM(w * w) AS HUGEINT) AS sww,
                CAST(SUM(y) AS HUGEINT) AS sy,
                SUM(CAST(t AS HUGEINT) * y) AS sty,
                SUM(CAST(w AS HUGEINT) * y) AS swy
              FROM f),
            d AS (
              SELECT n,
                n * (stt * sww - stw * stw) - st * (st * sww - stw * sw)
                  + sw * (st * stw - stt * sw) AS det,
                sy * (stt * sww - stw * stw) - st * (sty * sww - stw * swy)
                  + sw * (sty * stw - stt * swy) AS det_a,
                n * (sty * sww - stw * swy) - sy * (st * sww - stw * sw)
                  + sw * (st * swy - sty * sw) AS det_b,
                n * (stt * swy - sty * stw) - st * (st * swy - sty * sw)
                  + sy * (st * stw - stt * sw) AS det_c
              FROM m)
            SELECT CAST(n AS BIGINT) AS n_days,
              CASE WHEN det = 0 THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS det_zero,
              CASE WHEN det <> 0
                THEN CAST((1000 * det_a) // det AS BIGINT) END
                AS intercept_milli,
              CASE WHEN det <> 0
                THEN CAST((1000 * det_b) // det AS BIGINT) END
                AS slope_milli,
              CASE WHEN det <> 0
                THEN CAST((1000 * det_c) // det AS BIGINT) END
                AS weekend_milli
            FROM d"""))

  // ------------------------------------------------------------------- x285
  // Banded interval-overlap join — the join pattern the registry's range
  // tiers stop short of: c19 bands VALUES into a tiny tier dim, c20
  // matches each row to ONE prior row; this joins two interval SETS where
  // both sides are input-sized — user sessions (30-min-gap lag
  // sessionization, exact integer micros) against incident windows
  // (±15 min around a deterministic 1/97 sample of error events) — on
  // closed-interval overlap. The scale decision is the BANDING: each
  // interval explodes to its covered hour buckets, the join runs as an
  // EQUI-join on the bucket key (shuffle-hash-able, co-partitionable,
  // skew-salvageable — everything a raw theta join is not), a pair that
  // shares several buckets dedups through one distinct, and the exact
  // overlap predicate verifies after. Fan-out per interval is
  // ceil(duration/band)+1 — bounded by interval length, never by the
  // other side's size. Overlap reported in exact integer micros.
  //
  // The oracle states the SEMANTICS as the brute theta join — the banded
  // plan must reproduce it row-for-row, which is precisely the lossless
  // claim (band coverage is exhaustive: two intervals overlap iff they
  // share at least one covered bucket).
  private val x285 = GQuery(
    "x285_interval_overlap_join", "ext-events interval-join banded",
    (s, dir) => {
      val us = 1000000L
      val bandUs = 3600L * us
      val e = events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
      val w = Window.partitionBy("user_id").orderBy("tus")
      val sess = e
        .withColumn("brk",
          when(col("tus") - lag(col("tus"), 1).over(w) > 30L * 60L * us
            || lag(col("tus"), 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(min(col("tus")).as("s_start"), max(col("tus")).as("s_end"))
      val inc = e
        .where(col("event_type") === "error" && col("event_id") % 97 === 0)
        .select(col("event_id").as("incident_id"),
          (col("tus") - 15L * 60L * us).as("i_start"),
          (col("tus") + 15L * 60L * us).as("i_end"))
      val sessB = sess.withColumn("band",
        explode(sequence(expr(s"s_start div $bandUs"),
          expr(s"s_end div $bandUs"))))
      val incB = inc.withColumn("band",
        explode(sequence(expr(s"i_start div $bandUs"),
          expr(s"i_end div $bandUs"))))
      sessB.join(incB, "band")
        .where(col("s_start") <= col("i_end") && col("i_start") <= col("s_end"))
        .select(col("user_id"), col("session_idx"), col("incident_id"),
          col("s_start"), col("s_end"), col("i_start"), col("i_end"))
        .distinct()
        .select(col("user_id"), col("session_idx"), col("incident_id"),
          (least(col("s_end"), col("i_end"))
            - greatest(col("s_start"), col("i_start"))).as("overlap_us"))
        .orderBy("user_id", "session_idx", "incident_id")
    },
    Some("""WITH e AS (
              SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
              FROM events),
            m AS (
              SELECT user_id, tus,
                CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id
                    ORDER BY tus) > 1800000000
                  OR LAG(tus) OVER (PARTITION BY user_id ORDER BY tus)
                    IS NULL THEN 1 ELSE 0 END AS brk
              FROM e),
            g AS (
              SELECT user_id, tus,
                SUM(brk) OVER (PARTITION BY user_id ORDER BY tus
                  ROWS UNBOUNDED PRECEDING) AS session_idx
              FROM m),
            sess AS (
              SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                MIN(tus) AS s_start, MAX(tus) AS s_end
              FROM g GROUP BY 1, 2),
            inc AS (
              SELECT event_id AS incident_id,
                tus - 900000000 AS i_start, tus + 900000000 AS i_end
              FROM e WHERE event_type = 'error' AND event_id % 97 = 0)
            SELECT s.user_id, s.session_idx, i.incident_id,
              least(s.s_end, i.i_end) - greatest(s.s_start, i.i_start)
                AS overlap_us
            FROM sess s JOIN inc i
              ON s.s_start <= i.i_end AND i.i_start <= s.s_end
            ORDER BY s.user_id, s.session_idx, i.incident_id"""))

  // ------------------------------------------------------------------- x287
  // Group-aware train/val/test split — the ENTITY-level split x94's
  // document-level stratification cannot give: every event inherits its
  // USER's assignment (md5 of the user id against fixed hex bounds, the
  // x21 deterministic-coin discipline: 'cb'→~80 % train, 'e5'→~10 % val,
  // rest test), so no user ever straddles splits — the leakage a
  // sequence/behavior model trained on random event-level splits
  // silently enjoys (its test users' OTHER events were in training).
  // Leakage-freedom is structural (assignment is a pure function of the
  // user), and the emitted per-split audit — users, events, purchases,
  // purchase-rate milli — is exact integers, so the row hash-verifies.
  //
  // Scale shape: one narrow projection computes the assignment in the
  // scan (no user table materialized, no join), one 3-row rollup.
  private val x287 = GQuery(
    "x287_groupwise_split", "ext-events leakage-safe entity-split",
    (s, dir) => {
      events(s, dir)
        .select(col("user_id"), col("event_type"),
          substring(md5(concat(col("user_id"), lit(":x287"))), 1, 2).as("h"))
        .withColumn("split",
          when(col("h") <= "cb", "train")
            .when(col("h") <= "e5", "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"))
        .select(col("split"), col("n_users"), col("n_events"),
          col("n_purchases"),
          expr("(1000 * n_purchases) div n_events").as("purchase_rate_milli"))
        .orderBy("split")
    },
    Some("""WITH a AS (
              SELECT user_id, event_type,
                CASE WHEN substr(md5(user_id || ':x287'), 1, 2) <= 'cb'
                    THEN 'train'
                  WHEN substr(md5(user_id || ':x287'), 1, 2) <= 'e5'
                    THEN 'val'
                  ELSE 'test' END AS split
              FROM events)
            SELECT split, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
              (1000 * CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                ELSE 0 END) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
                AS purchase_rate_milli
            FROM a GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x288
  // Run-length collapse of consecutive duplicate events — the
  // at-least-once ingestion artifact every event pipeline scrubs:
  // a client retry or redelivery lands the SAME action again moments
  // later, and downstream counters double-bill unless immediately-
  // repeated events collapse to their run's first row. Distinct from
  // x32's keyed dedup (which needs an identity key and a ledger): this
  // is POSITIONAL — only consecutive repeats of the same type within a
  // user's timeline collapse; the same action genuinely repeated later
  // stays. Exact: runs delimited by lag() over (user, time, event_id);
  // per-user per-type audit of rows in vs runs kept.
  //
  // Scale shape: one user-keyed window pass (the x115/x268 lag shape —
  // the partition key is the user, so the sort is per-user-bounded),
  // one rollup; nothing else moves.
  private val x288 = GQuery(
    "x288_runlength_collapse", "ext-events ingest-dedup run-length",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("tus"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("first_of_run",
          when(col("event_type") === lag(col("event_type"), 1).over(w), 0L)
            .otherwise(1L))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("first_of_run")).as("n_runs"))
        .where(col("n_rows") > col("n_runs"))
        .select(col("user_id"), col("event_type"), col("n_rows"),
          col("n_runs"), (col("n_rows") - col("n_runs")).as("n_collapsed"))
        .orderBy("user_id", "event_type")
    },
    Some("""WITH e AS (
              SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
              FROM events),
            m AS (
              SELECT user_id, event_type,
                CASE WHEN event_type = LAG(event_type) OVER w
                  THEN 0 ELSE 1 END AS first_of_run
              FROM e WINDOW w AS (PARTITION BY user_id
                ORDER BY tus, event_id))
            SELECT user_id, event_type,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(first_of_run) AS BIGINT) AS n_runs,
              CAST(COUNT(*) - SUM(first_of_run) AS BIGINT) AS n_collapsed
            FROM m GROUP BY 1, 2
            HAVING COUNT(*) > SUM(first_of_run)
            ORDER BY 1, 2"""))

  // ------------------------------------------------------------------- x289
  // Aggregation-reversal (Simpson's paradox) audit — the sanity check a
  // metrics pipeline runs before publishing any pooled correlation: per
  // event_type, the EXACT sign of cov(hour-of-day, value) from integer
  // moments (sign(n·Σxy − Σx·Σy) — no division, no floats), next to the
  // pooled sign over all types, flagging every stratum whose trend
  // opposes the pooled trend (the reversal that makes a pooled "values
  // rise through the day" claim false for a segment). Moments ride
  // DECIMAL(38,0)/HUGEINT (the x270 headroom discipline — Σxy is
  // hour·cents ≈ 10¹⁰ per row, past 2⁶³ in BIGINT well before 10¹²
  // rows).
  //
  // Scale shape: one map-side-combinable 4-moment aggregate per type,
  // pooled moments as a |type|-domain window over the 5-row group table.
  private val x289 = GQuery(
    "x289_simpson_audit", "ext-events metric-audit aggregation-reversal",
    (s, dir) => {
      val all = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      events(s, dir)
        .select(col("event_type"),
          hour(col("ts")).cast("long").as("x"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).cast("decimal(38,0)").as("sx"),
          sum(col("y")).cast("decimal(38,0)").as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
        .withColumn("np", sum(col("n")).over(all))
        .withColumn("sxp", sum(col("sx")).over(all))
        .withColumn("syp", sum(col("sy")).over(all))
        .withColumn("sxyp", sum(col("sxy")).over(all))
        .withColumn("cov_g", expr("n * sxy - sx * sy"))
        .withColumn("cov_p", expr("np * sxyp - sxp * syp"))
        .select(col("event_type"), col("n").cast("long").as("n_events"),
          expr("cast(case when cov_g > 0 then 1 when cov_g < 0 then -1 " +
            "else 0 end as bigint)").as("sign_stratum"),
          col("cov_p"))
        .withColumn("sign_pooled", expr(
          "cast(case when cov_p > 0 then 1 when cov_p < 0 then -1 " +
            "else 0 end as bigint)"))
        .withColumn("reversed",
          (col("sign_stratum") * col("sign_pooled")) < 0)
        .drop("cov_p")
        .orderBy("event_type")
    },
    Some("""WITH m AS (
              SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
                CAST(SUM(hour(ts)) AS HUGEINT) AS sx,
                CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS HUGEINT) AS sy,
                SUM(CAST(hour(ts) AS HUGEINT)
                  * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS sxy
              FROM events GROUP BY 1),
            g AS (
              SELECT event_type, n, n * sxy - sx * sy AS cov_g,
                SUM(n) OVER () * SUM(sxy) OVER ()
                  - SUM(sx) OVER () * SUM(sy) OVER () AS cov_p
              FROM m)
            SELECT event_type, CAST(n AS BIGINT) AS n_events,
              CAST(CASE WHEN cov_g > 0 THEN 1 WHEN cov_g < 0 THEN -1
                ELSE 0 END AS BIGINT) AS sign_stratum,
              CAST(CASE WHEN cov_p > 0 THEN 1 WHEN cov_p < 0 THEN -1
                ELSE 0 END AS BIGINT) AS sign_pooled,
              (CASE WHEN cov_g > 0 THEN 1 WHEN cov_g < 0 THEN -1 ELSE 0 END)
                * (CASE WHEN cov_p > 0 THEN 1 WHEN cov_p < 0 THEN -1
                    ELSE 0 END) < 0 AS reversed
            FROM g ORDER BY event_type"""))

  // ------------------------------------------------------------------- x296
  // Per-stream freshness audit — the staleness read an on-call runs
  // first when a dashboard flatlines: per event_type, the newest event's
  // lag behind the corpus watermark (global max ts), plus volume in the
  // last watermark-relative day. A type whose lag_us is large has
  // stopped flowing; a type with normal lag but collapsed last-day
  // volume is throttled. Everything is exact integer micros anchored to
  // the DATA's own watermark (no wall clock — deterministic and
  // cross-engine by construction).
  //
  // Scale shape: one map-side-combinable per-type aggregate + one 1-row
  // global watermark broadcast.
  private val x296 = GQuery(
    "x296_freshness_audit", "ext-events ops-monitor freshness-lag",
    (s, dir) => {
      val e = events(s, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("tus"))
      val wm = e.agg(max(col("tus")).as("watermark_us"))
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), max(col("tus")).as("newest_us"))
        .crossJoin(broadcast(wm))
        .select(col("event_type"), col("n_events"),
          (col("watermark_us") - col("newest_us")).as("lag_us"))
        .join(
          e.crossJoin(broadcast(wm))
            .where(col("tus") >= col("watermark_us") - lit(86400000000L))
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_last_day")),
          Seq("event_type"), "left")
        .select(col("event_type"), col("n_events"), col("lag_us"),
          coalesce(col("n_last_day"), lit(0L)).as("n_last_day"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
              SELECT event_type, epoch_us(ts) AS tus FROM events),
            wm AS (SELECT MAX(tus) AS watermark_us FROM e),
            base AS (
              SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
                MAX(tus) AS newest_us
              FROM e GROUP BY 1),
            ld AS (
              SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_last_day
              FROM e, wm WHERE tus >= watermark_us - 86400000000
              GROUP BY 1)
            SELECT b.event_type, b.n_events,
              w.watermark_us - b.newest_us AS lag_us,
              COALESCE(ld.n_last_day, 0) AS n_last_day
            FROM base b CROSS JOIN wm w
            LEFT JOIN ld ON ld.event_type = b.event_type
            ORDER BY b.event_type"""))

  // ------------------------------------------------------------------- x297
  // Out-of-order arrival audit — the number a watermark/allowed-lateness
  // setting is actually tuned from: treating event_id as arrival order
  // (the fixture's ingestion sequence) and ts as event time, how often
  // does event time REGRESS between consecutive arrivals per user, and
  // how far back (max regression micros)? A p99-ish lateness budget set
  // without this table is folklore. Exact: one user-keyed lag window
  // over arrival order; per-type rollup in integer micros and millis.
  //
  // Scale shape: the x115/x268 user-keyed window pass + one rollup.
  private val x297 = GQuery(
    "x297_out_of_order_audit", "ext-events ops-monitor lateness",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("prev_tus", lag(col("tus"), 1).over(w))
        .where(col("prev_tus").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_arrivals"),
          sum(when(col("tus") < col("prev_tus"), 1L).otherwise(0L))
            .as("n_regressions"),
          max(when(col("tus") < col("prev_tus"),
            col("prev_tus") - col("tus")).otherwise(0L))
            .as("max_regression_us"))
        .select(col("event_type"), col("n_arrivals"), col("n_regressions"),
          expr("(1000 * n_regressions) div n_arrivals")
            .as("regression_milli"),
          col("max_regression_us"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
              SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
              FROM events),
            m AS (
              SELECT event_type, tus,
                LAG(tus) OVER (PARTITION BY user_id ORDER BY event_id)
                  AS prev_tus
              FROM e)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_arrivals,
              CAST(SUM(CASE WHEN tus < prev_tus THEN 1 ELSE 0 END)
                AS BIGINT) AS n_regressions,
              (1000 * CAST(SUM(CASE WHEN tus < prev_tus THEN 1 ELSE 0 END)
                AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS regression_milli,
              CAST(MAX(CASE WHEN tus < prev_tus THEN prev_tus - tus
                ELSE 0 END) AS BIGINT) AS max_regression_us
            FROM m WHERE prev_tus IS NOT NULL
            GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x299
  // CUSUM error-rate change detection (Page 1954) — the sequential
  // monitor behind every "did the error rate SHIFT, not just blip"
  // alert: over daily error counts, the one-sided CUSUM
  // S_t = max(0, S_{t−1} + (x_t − k)) against the series' own mean k.
  // The recursion looks un-SQL-able, but it has the exact prefix-sum
  // closed form S_t = P_t − min(0, min_{j≤t} P_j) with P the running
  // sum of deviations — two day-domain windows, no iteration, no UDF.
  // Everything in milli-units of events (k = (1000·total) div n_days,
  // x = 1000·count), so both engines walk identical integers; alarm at
  // the conventional S > 4k.
  //
  // Scale shape: one fact aggregate to the day domain, two domain-sized
  // cumulative windows, integer arithmetic per day row.
  private val x299 = GQuery(
    "x299_cusum_error_monitor", "ext-events drift-monitor cusum",
    (s, dir) => {
      val byDay = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val all = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      events(s, dir)
        .where(col("event_type") === "error")
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
        .withColumn("tot", sum(col("c")).over(all))
        .withColumn("nd", count(col("c")).over(all))
        .withColumn("k", expr("(1000 * tot) div nd"))
        .withColumn("dev", col("c") * 1000 - col("k"))
        .withColumn("p", sum(col("dev")).over(byDay))
        .withColumn("m", least(lit(0L), min(col("p")).over(byDay)))
        .select(col("day"), col("c").as("n_errors"),
          (col("p") - col("m")).as("cusum_milli"), col("k"),
          ((col("p") - col("m")) > col("k") * 4).as("alarm"))
        .orderBy("day")
    },
    Some("""WITH d AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS c
              FROM events WHERE event_type = 'error' GROUP BY 1),
            k AS (
              SELECT day, c,
                (1000 * SUM(c) OVER ()) // COUNT(c) OVER () AS k
              FROM d),
            p AS (
              SELECT day, c, k, SUM(c * 1000 - k) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS p
              FROM k),
            s AS (
              SELECT day, c, k, p,
                least(0, MIN(p) OVER (ORDER BY day
                  ROWS UNBOUNDED PRECEDING)) AS m
              FROM p)
            SELECT day, c AS n_errors,
              CAST(p - m AS BIGINT) AS cusum_milli,
              CAST(k AS BIGINT) AS k,
              (p - m) > k * 4 AS alarm
            FROM s ORDER BY day"""))

  // ------------------------------------------------------------------- x308
  // Matthews correlation — the single-number classifier summary that,
  // unlike accuracy or F1 (x253), is defensible under class imbalance
  // (Matthews 1975; the metric BOTH classes must agree on). The decision
  // rule is the x263-style threshold stump (value ≥ 50 predicts 'error');
  // the confusion quadrants are exact integer counts, and the headline
  // MCC is computed from them with an expression whose float steps are
  // IDENTICAL in both engines (exact-int → double casts, left-assoc
  // products, one correctly-rounded sqrt) — so even the double
  // hash-verifies. The numerator is formed in DECIMAL(38,0)/HUGEINT
  // (tp·tn at 10⁹ rows passes 2⁶³ — the x270 headroom discipline).
  //
  // Scale shape: one map-side-combinable 4-counter aggregate over the
  // fact scan; the MCC arithmetic runs on one row.
  private val x308 = GQuery(
    "x308_matthews_corr", "ext-analytics classifier-eval mcc",
    (s, dir) =>
      events(s, dir)
        .select(when(col("value") >= 50.0, 1L).otherwise(0L).as("pred"),
          when(col("event_type") === "error", 1L).otherwise(0L).as("label"))
        .agg(sum(expr("pred * label")).as("tp"),
          sum(expr("pred * (1 - label)")).as("fp"),
          sum(expr("(1 - pred) * label")).as("fn"),
          sum(expr("(1 - pred) * (1 - label)")).as("tn"))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          expr("""CASE WHEN (tp + fp) = 0 OR (tp + fn) = 0
                    OR (tn + fp) = 0 OR (tn + fn) = 0
                  THEN CAST(0.0 AS DOUBLE)
                  ELSE CAST(CAST(tp AS DECIMAL(38,0)) * tn
                            - CAST(fp AS DECIMAL(38,0)) * fn AS DOUBLE)
                       / sqrt(CAST(tp + fp AS DOUBLE)
                              * CAST(tp + fn AS DOUBLE)
                              * CAST(tn + fp AS DOUBLE)
                              * CAST(tn + fn AS DOUBLE)) END""").as("mcc")),
    Some("""WITH c AS (
              SELECT
                CAST(SUM(CASE WHEN value >= 50 AND event_type = 'error'
                  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(SUM(CASE WHEN value >= 50 AND event_type <> 'error'
                  THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                CAST(SUM(CASE WHEN value < 50 AND event_type = 'error'
                  THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                CAST(SUM(CASE WHEN value < 50 AND event_type <> 'error'
                  THEN 1 ELSE 0 END) AS BIGINT) AS tn
              FROM events)
            SELECT tp, fp, fn, tn,
              CASE WHEN (tp + fp) = 0 OR (tp + fn) = 0
                OR (tn + fp) = 0 OR (tn + fn) = 0
              THEN 0.0
              ELSE CAST(CAST(tp AS HUGEINT) * tn
                        - CAST(fp AS HUGEINT) * fn AS DOUBLE)
                   / sqrt(CAST(tp + fp AS DOUBLE)
                          * CAST(tp + fn AS DOUBLE)
                          * CAST(tn + fp AS DOUBLE)
                          * CAST(tn + fn AS DOUBLE)) END AS mcc
            FROM c"""))

  // ------------------------------------------------------------------- x310
  // Inter-arrival cadence profile — x118's per-user bot read lifted to
  // the per-TYPE operational view: for each event type, exact
  // nearest-rank p50/p90/p99 of the within-user inter-arrival gap in
  // microseconds. The freshness-SLA read an event pipeline alarms on
  // (p99 cadence collapsing → a producer went bursty; exploding → a
  // producer stalled). Gaps order within (user, type) by (ts, event_id)
  // — the deterministic tiebreak the whole events family uses.
  //
  // Scale shape: the x214/x273 "facts never sort" discipline — the
  // per-user lag window shuffles on user_id (never global), then the
  // percentile picks run on the (type, gap)-DOMAIN grid with cumsum
  // windows, so no fact-sized sort and no single-partition window.
  private val x310 = GQuery(
    "x310_interarrival_profile", "ext-events cadence-sla percentiles",
    (s, dir) => {
      val wSeq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wSeq))
        .where(col("prev_us").isNotNull)
        .select(col("event_type"),
          (unix_micros(col("ts")) - col("prev_us")).as("gap_us"))
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("gap_us"))
      val all = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      gaps.groupBy(col("event_type"), col("gap_us"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("c", sum(col("cnt")).over(wt))
        .withColumn("n", sum(col("cnt")).over(all))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_gaps"),
          max(when(expr("c - cnt < (n + 1) div 2 AND (n + 1) div 2 <= c"),
            col("gap_us"))).as("p50_us"),
          max(when(expr("c - cnt < (9 * n + 9) div 10 AND (9 * n + 9) div 10 <= c"),
            col("gap_us"))).as("p90_us"),
          max(when(expr("c - cnt < (99 * n + 99) div 100 AND (99 * n + 99) div 100 <= c"),
            col("gap_us"))).as("p99_us"))
        .orderBy("event_type")
    },
    Some("""WITH g AS (
              SELECT event_type,
                epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                  PARTITION BY user_id, event_type
                  ORDER BY ts, event_id) AS gap_us
              FROM events),
            d AS (SELECT event_type, gap_us,
                    CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM g WHERE gap_us IS NOT NULL GROUP BY 1, 2),
            c AS (SELECT event_type, gap_us, cnt,
                    CAST(SUM(cnt) OVER (PARTITION BY event_type
                      ORDER BY gap_us) AS BIGINT) AS c,
                    CAST(SUM(cnt) OVER (PARTITION BY event_type)
                      AS BIGINT) AS n
                  FROM d)
            SELECT event_type, MAX(n) AS n_gaps,
              MAX(CASE WHEN c - cnt < (n + 1) // 2
                AND (n + 1) // 2 <= c THEN gap_us END) AS p50_us,
              MAX(CASE WHEN c - cnt < (9 * n + 9) // 10
                AND (9 * n + 9) // 10 <= c THEN gap_us END) AS p90_us,
              MAX(CASE WHEN c - cnt < (99 * n + 99) // 100
                AND (99 * n + 99) // 100 <= c THEN gap_us END) AS p99_us
            FROM c GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x321
  // Candidate-key uniqueness audit — the schema-contract check upstream
  // of every MERGE/upsert this engine ships (x179's correctness rests on
  // the key actually being one): for each candidate key of the events
  // table, exact row/distinct/duplicate counts and the verdict. x210
  // discovers functional dependencies; this pins the specific contracts
  // a pipeline declares. Distinct counts run as DISTINCT-project then
  // count (not multi-arg COUNT DISTINCT) so Spark and DuckDB share one
  // null semantic by construction.
  //
  // Scale shape: one distinct-aggregate per candidate (map-side
  // combinable hash distinct), 1-row results unioned on the driver plan
  // side — the fact table is scanned per candidate but never joined.
  private val x321 = GQuery(
    "x321_key_uniqueness_audit", "ext-quality schema-contract key-audit",
    (s, dir) => {
      val e = events(s, dir)
      def audit(name: String, cols: Seq[String]): DataFrame = {
        val d = e.select(cols.map(col): _*).distinct()
          .agg(count(lit(1)).as("n_distinct"))
        e.agg(count(lit(1)).as("n_rows")).crossJoin(broadcast(d))
          .select(lit(name).as("candidate"), col("n_rows"),
            col("n_distinct"),
            (col("n_rows") - col("n_distinct")).as("n_dup_rows"),
            (col("n_rows") === col("n_distinct")).as("is_key"))
      }
      audit("event_id", Seq("event_id"))
        .unionAll(audit("user_id+ts", Seq("user_id", "ts")))
        .unionAll(audit("user_id+type+ts", Seq("user_id", "event_type", "ts")))
        .orderBy("candidate")
    },
    Some("""WITH r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows
              FROM events),
            a AS (SELECT 'event_id' AS candidate,
                    CAST(COUNT(*) AS BIGINT) AS n_distinct
                  FROM (SELECT DISTINCT event_id FROM events)),
            b AS (SELECT 'user_id+ts' AS candidate,
                    CAST(COUNT(*) AS BIGINT) AS n_distinct
                  FROM (SELECT DISTINCT user_id, ts FROM events)),
            c AS (SELECT 'user_id+type+ts' AS candidate,
                    CAST(COUNT(*) AS BIGINT) AS n_distinct
                  FROM (SELECT DISTINCT user_id, event_type, ts
                        FROM events)),
            u AS (SELECT * FROM a UNION ALL SELECT * FROM b
                  UNION ALL SELECT * FROM c)
            SELECT u.candidate, r.n_rows, u.n_distinct,
              r.n_rows - u.n_distinct AS n_dup_rows,
              r.n_rows = u.n_distinct AS is_key
            FROM u, r ORDER BY u.candidate"""))

  // ------------------------------------------------------------------- x322
  // Day-over-day change attribution — the on-call question behind every
  // volume alarm (x134 flags the day; this names the culprit): per day,
  // the total delta vs the previous day and the event type contributing
  // the LARGEST absolute share of that delta, with its exact milli
  // share. Argmax is a deterministic window rank ordered by
  // (|delta| desc, type) — never a tie-unstable max_by. Days without a
  // predecessor are excluded (no delta to attribute).
  //
  // Scale shape: one (day, type) grid aggregate off the fact scan; the
  // lag windows and the rank run on the grid, partitioned by day/type —
  // nothing fact-sized sorts.
  private val x322 = GQuery(
    "x322_change_attribution", "ext-events anomaly-attribution",
    (s, dir) => {
      val grid = events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
      val perType = grid
        .withColumn("prev", lag(col("n"), 1).over(wt))
        .where(col("prev").isNotNull)
        .withColumn("delta", col("n") - col("prev"))
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("day"))
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("day"))
        .orderBy(abs(col("delta")).desc, col("event_type"))
      perType
        .withColumn("delta_total", sum(col("delta")).over(wd))
        .withColumn("rk", row_number().over(wr))
        .where(col("rk") === 1)
        .select(col("day"), col("delta_total"),
          col("event_type").as("top_type"), col("delta").as("top_delta"),
          when(col("delta_total") =!= 0,
            expr("(1000 * top_delta) div delta_total"))
            .as("top_share_milli"))
        .orderBy("day")
    },
    Some("""WITH g AS (
              SELECT date_trunc('day', ts) AS day, event_type,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            p AS (
              SELECT day, event_type, n,
                n - LAG(n) OVER (PARTITION BY event_type ORDER BY day)
                  AS delta
              FROM g),
            q AS (
              SELECT day, event_type, delta,
                CAST(SUM(delta) OVER (PARTITION BY day) AS BIGINT)
                  AS delta_total,
                ROW_NUMBER() OVER (PARTITION BY day
                  ORDER BY ABS(delta) DESC, event_type) AS rk
              FROM p WHERE delta IS NOT NULL)
            SELECT day, delta_total, event_type AS top_type,
              delta AS top_delta,
              CASE WHEN delta_total <> 0
                THEN CAST((1000 * delta) // delta_total AS BIGINT) END
                AS top_share_milli
            FROM q WHERE rk = 1 ORDER BY day"""))

  // ------------------------------------------------------------------- x323
  // Weekly active-user churn accounting — the growth table every event
  // warehouse publishes (active / new / churned / retention per week),
  // exact: new = first-ever week for the user, churned = active the
  // previous week but absent this week, retention = retained share of
  // the previous week's actives in millis. Week boundaries via
  // date_trunc('week') (Monday in both engines); churn matches on exact
  // +7-day week arithmetic, so the table hash-verifies.
  //
  // Scale shape: one distinct (user, week) projection off the fact scan
  // (map-side combinable), then all accounting runs on the user-week
  // grid: a per-user min, one self anti-ish join on (user, week+7d) —
  // grid-sized exchanges keyed by user/week, nothing fact-sized.
  private val x323 = GQuery(
    "x323_weekly_churn", "ext-events growth-accounting churn",
    (s, dir) => {
      val uw = events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        .distinct()
      val first = uw.groupBy(col("user_id"))
        .agg(min(col("week")).as("first_week"))
      val active = uw.groupBy(col("week"))
        .agg(count(lit(1)).as("n_active"))
      val news = uw.join(first, "user_id")
        .where(col("week") === col("first_week"))
        .groupBy(col("week")).agg(count(lit(1)).as("n_new"))
      val retained = uw.as("cur")
        .join(uw.select(col("user_id"),
          (col("week") + expr("INTERVAL 7 DAYS")).as("week")).as("prev"),
          Seq("user_id", "week"))
        .groupBy(col("week")).agg(count(lit(1)).as("n_retained"))
      val prevActive = active.select(
        (col("week") + expr("INTERVAL 7 DAYS")).as("week"),
        col("n_active").as("n_prev_active"))
      active.join(news, Seq("week"), "left")
        .join(retained, Seq("week"), "left")
        .join(prevActive, Seq("week"), "left")
        .select(col("week"), col("n_active"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          (coalesce(col("n_prev_active"), lit(0L))
            - coalesce(col("n_retained"), lit(0L))).as("n_churned"),
          when(col("n_prev_active").isNotNull,
            expr("(1000 * coalesce(n_retained, 0)) div n_prev_active"))
            .as("retention_milli"))
        .orderBy("week")
    },
    Some("""WITH uw AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS week
              FROM events),
            f AS (SELECT user_id, MIN(week) AS first_week
                  FROM uw GROUP BY 1),
            act AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS n_active
                    FROM uw GROUP BY 1),
            nw AS (SELECT uw.week, CAST(COUNT(*) AS BIGINT) AS n_new
                   FROM uw JOIN f USING (user_id)
                   WHERE uw.week = f.first_week GROUP BY 1),
            ret AS (
              SELECT c.week, CAST(COUNT(*) AS BIGINT) AS n_retained
              FROM uw c JOIN uw p ON p.user_id = c.user_id
                AND p.week + INTERVAL 7 DAY = c.week
              GROUP BY 1),
            pa AS (SELECT week + INTERVAL 7 DAY AS week,
                     n_active AS n_prev_active
                   FROM act)
            SELECT a.week, a.n_active,
              COALESCE(nw.n_new, 0) AS n_new,
              COALESCE(ret.n_retained, 0) AS n_retained,
              COALESCE(pa.n_prev_active, 0) - COALESCE(ret.n_retained, 0)
                AS n_churned,
              CASE WHEN pa.n_prev_active IS NOT NULL
                THEN CAST((1000 * COALESCE(ret.n_retained, 0))
                  // pa.n_prev_active AS BIGINT) END AS retention_milli
            FROM act a
            LEFT JOIN nw ON nw.week = a.week
            LEFT JOIN ret ON ret.week = a.week
            LEFT JOIN pa ON pa.week = a.week
            ORDER BY a.week"""))

  // ------------------------------------------------------------------- x331
  // Session-gap threshold curve — the planning read BEFORE committing to
  // a sessionization cutoff (c17/x17 hard-code one; this row shows what
  // the choice costs): for each candidate idle gap (15/30/60 min),
  // exact session count and mean events-per-session in millis. Session
  // count = users + gaps above the cutoff — a closed form over the gap
  // stream, so no per-threshold re-sessionization pass.
  //
  // Scale shape: ONE per-user lag window (shuffles on user_id, never
  // global) feeds every threshold; the 3-way threshold explode runs on
  // the gap stream in-pipeline and rolls up to 3 rows.
  private val x331 = GQuery(
    "x331_session_threshold_curve", "ext-events sessionization planning",
    (s, dir) => {
      val e = events(s, dir)
      val wSeq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gaps = e
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wSeq))
        .where(col("prev_us").isNotNull)
        .select((unix_micros(col("ts")) - col("prev_us")).as("gap_us"))
      val base = e.agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      val breaks = gaps
        .select(col("gap_us"), explode(expr(
          "array(900L, 1800L, 3600L)")).as("theta_sec"))
        .where(col("gap_us") > col("theta_sec") * 1000000L)
        .groupBy(col("theta_sec")).agg(count(lit(1)).as("n_breaks"))
      // a threshold so large no gap exceeds it still needs its row
      val thetas = e.sparkSession.range(1).select(explode(expr(
        "array(900L, 1800L, 3600L)")).as("theta_sec"))
      // breaks is explicitly broadcast (≤3 rows — one per threshold): the
      // r11 driver's timed regen flipped this join's build side vs the
      // committed fingerprint (the ONLY diff among 445) — a stats/
      // core-count-sensitive CBO choice on two tiny sides. Domains this
      // small are ALWAYS broadcast; pinning makes the fingerprint
      // environment-independent.
      thetas
        .join(broadcast(breaks), Seq("theta_sec"), "left")
        .crossJoin(broadcast(base))
        .select(col("theta_sec"),
          (col("n_users") + coalesce(col("n_breaks"), lit(0L)))
            .as("n_sessions"),
          expr("""(1000 * n_events)
              div (n_users + coalesce(n_breaks, 0))""")
            .as("events_per_session_milli"))
        .orderBy("theta_sec")
    },
    Some("""WITH g AS (
              SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
              FROM events),
            base AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
              FROM events),
            th AS (SELECT CAST(unnest([900, 1800, 3600]) AS BIGINT)
                     AS theta_sec),
            br AS (
              SELECT th.theta_sec, CAST(COUNT(*) AS BIGINT) AS n_breaks
              FROM g, th
              WHERE g.gap_us IS NOT NULL
                AND g.gap_us > th.theta_sec * 1000000
              GROUP BY 1)
            SELECT th.theta_sec,
              base.n_users + COALESCE(br.n_breaks, 0) AS n_sessions,
              CAST((1000 * base.n_events)
                // (base.n_users + COALESCE(br.n_breaks, 0)) AS BIGINT)
                AS events_per_session_milli
            FROM th LEFT JOIN br ON br.theta_sec = th.theta_sec, base
            ORDER BY th.theta_sec"""))

  // ------------------------------------------------------------------ x338
  // Ordered funnel conversion — the product-analytics primitive the
  // cadence family (x323 churn, x331 sessions) still lacked: how many
  // users progress view → click → signup → purchase IN ORDER, with
  // strict-sequence semantics AND a 24 h per-step conversion window
  // (each stage's timestamp is the earliest event of that type AFTER
  // the previous stage's timestamp and within 86 400 s of it — a click
  // before the first view, or a signup a week later, does not count).
  // Stage times are nested minima computed from per-user per-type
  // timestamp lists with
  // higher-order filters, so the whole funnel is ONE per-user aggregate
  // — no self-joins, no window over the event stream. Output: one row —
  // population, users reaching each stage, full-funnel and per-step
  // conversion in millis.
  //
  // Scale shape: one (user_id) shuffle of (type, ts) pairs; per-user
  // lists are bounded by per-user activity (the same envelope every
  // per-user operator here rides); the rollup is 1 row. At 100 TB the
  // funnel is exactly this: group by user, fold the event list.
  private val x338 = GQuery(
    "x338_funnel_conversion", "ext-events funnel ordered-conversion",
    (s, dir) => {
      val perUser = Tables(s, dir, "events")
        .where(col("event_type").isin("view", "click", "signup", "purchase"))
        .select(col("user_id"), col("event_type"), col("ts").cast("long").as("t"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("t"))).as("t1"),
          collect_list(when(col("event_type") === "click", col("t"))).as("lc"),
          collect_list(when(col("event_type") === "signup", col("t"))).as("ls"),
          collect_list(when(col("event_type") === "purchase", col("t"))).as("lp"))
        .withColumn("t2", expr("array_min(filter(lc, x -> x > t1 AND x <= t1 + 86400))"))
        .withColumn("t3", expr("array_min(filter(ls, x -> x > t2 AND x <= t2 + 86400))"))
        .withColumn("t4", expr("array_min(filter(lp, x -> x > t3 AND x <= t3 + 86400))"))
      perUser.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("reached_view"),
        sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("reached_click"),
        sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("reached_signup"),
        sum(when(col("t4").isNotNull, 1L).otherwise(0L)).as("reached_purchase"))
        .select(col("n_users"), col("reached_view"), col("reached_click"),
          col("reached_signup"), col("reached_purchase"),
          expr("(1000 * reached_purchase) div n_users").as("full_funnel_milli"),
          expr("CASE WHEN reached_view > 0 THEN (1000 * reached_click) div reached_view ELSE 0 END")
            .as("step_click_milli"),
          expr("CASE WHEN reached_click > 0 THEN (1000 * reached_signup) div reached_click ELSE 0 END")
            .as("step_signup_milli"),
          expr("CASE WHEN reached_signup > 0 THEN (1000 * reached_purchase) div reached_signup ELSE 0 END")
            .as("step_purchase_milli"))
    },
    Some("""WITH ev AS (
              SELECT user_id, event_type, CAST(epoch(ts) AS BIGINT) AS t
              FROM events
              WHERE event_type IN ('view', 'click', 'signup', 'purchase')),
            pu AS (
              SELECT user_id,
                MIN(CASE WHEN event_type = 'view' THEN t END) AS t1,
                list(t) FILTER (WHERE event_type = 'click') AS lc,
                list(t) FILTER (WHERE event_type = 'signup') AS ls,
                list(t) FILTER (WHERE event_type = 'purchase') AS lp
              FROM ev GROUP BY 1),
            s2 AS (SELECT *, list_min(list_filter(lc,
                     x -> x > t1 AND x <= t1 + 86400)) AS t2 FROM pu),
            s3 AS (SELECT *, list_min(list_filter(ls,
                     x -> x > t2 AND x <= t2 + 86400)) AS t3 FROM s2),
            s4 AS (SELECT *, list_min(list_filter(lp,
                     x -> x > t3 AND x <= t3 + 86400)) AS t4 FROM s3),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS reached_view,
                CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS reached_click,
                CAST(SUM(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS reached_signup,
                CAST(SUM(CASE WHEN t4 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS reached_purchase
              FROM s4)
            SELECT n_users, reached_view, reached_click, reached_signup,
              reached_purchase,
              CAST((1000 * reached_purchase) // n_users AS BIGINT)
                AS full_funnel_milli,
              CAST(CASE WHEN reached_view > 0
                   THEN (1000 * reached_click) // reached_view
                   ELSE 0 END AS BIGINT) AS step_click_milli,
              CAST(CASE WHEN reached_click > 0
                   THEN (1000 * reached_signup) // reached_click
                   ELSE 0 END AS BIGINT) AS step_signup_milli,
              CAST(CASE WHEN reached_signup > 0
                   THEN (1000 * reached_purchase) // reached_signup
                   ELSE 0 END AS BIGINT) AS step_purchase_milli
            FROM agg"""))

  // ------------------------------------------------------------------- x342
  // Differential-privacy sensitivity advisor (Dwork et al. 2006; the
  // contribution-bounding discipline of Wilson et al. 2020, "DP SQL") —
  // the pre-release audit a DP aggregate needs BEFORE noise is chosen:
  // per event_type, how many events can one user contribute (the L∞
  // contribution k), what clip bound a nearest-rank p95 suggests, what
  // fraction of real events that clip discards, and the Laplace scale
  // b = k_clip/ε the clipped count query then needs at each ε on the
  // menu. Everything is exact integers: nearest-rank p95 is the x278
  // discipline (smallest rank with 20·rn ≥ 19·n, ties broken by
  // user_id), the clip loss is a ratio of event counts, and b rides in
  // milli-units as (10000·k_clip) div eps_tenths.
  //
  // Scale shape: one (type, user) aggregate off the fact table, one
  // type-partitioned rank window over the per-user table, one re-read of
  // that per-user aggregate against the broadcast per-type clip bounds,
  // and a 3-row ε-menu explode of the type-domain result.
  private val x342 = GQuery(
    "x342_dp_sensitivity", "ext-events privacy dp-sensitivity advisor",
    (s, dir) => {
      val per = events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // read twice: rank stats + clip loss
      val wT = Window.partitionBy(col("event_type"))
        .orderBy(col("cnt"), col("user_id"))
      val stats = per
        .withColumn("rn", row_number().over(wT).cast("long"))
        .withColumn("nu",
          count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(max(col("nu")).as("n_users"), max(col("cnt")).as("k_max"),
          sum(col("cnt")).as("n_events"),
          min(when(col("rn") * 20 >= col("nu") * 19, col("cnt")))
            .as("k_clip"))
      val loss = per
        .join(broadcast(stats.select(col("event_type"), col("k_clip"))),
          "event_type")
        .groupBy(col("event_type"))
        .agg(sum(greatest(col("cnt") - col("k_clip"), lit(0L)))
          .as("clipped"))
      stats.join(loss, "event_type")
        .select(col("event_type"), col("n_users"), col("n_events"),
          col("k_max"), col("k_clip"),
          expr("cast((1000 * clipped) div n_events as bigint)")
            .as("clip_loss_milli"),
          explode(expr("array(5L, 10L, 20L)")).as("eps_tenths"))
        .withColumn("b_count_milli",
          expr("cast((10000 * k_clip) div eps_tenths as bigint)"))
        .orderBy("event_type", "eps_tenths")
    },
    Some("""WITH per AS (
              SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM events GROUP BY 1, 2),
            r AS (
              SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                  ORDER BY cnt, user_id) AS BIGINT) AS rn,
                CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                  AS nu
              FROM per),
            stats AS (
              SELECT event_type, MAX(nu) AS n_users, MAX(cnt) AS k_max,
                CAST(SUM(cnt) AS BIGINT) AS n_events,
                MIN(CASE WHEN rn * 20 >= nu * 19 THEN cnt END) AS k_clip
              FROM r GROUP BY 1),
            loss AS (
              SELECT per.event_type,
                CAST(SUM(GREATEST(per.cnt - s.k_clip, 0)) AS BIGINT)
                  AS clipped
              FROM per JOIN stats s USING (event_type) GROUP BY 1)
            SELECT s.event_type, s.n_users, s.n_events, s.k_max, s.k_clip,
              CAST((1000 * l.clipped) // s.n_events AS BIGINT)
                AS clip_loss_milli,
              CAST(eps_tenths AS BIGINT) AS eps_tenths,
              CAST((10000 * s.k_clip) // eps_tenths AS BIGINT)
                AS b_count_milli
            FROM stats s JOIN loss l ON s.event_type = l.event_type
            CROSS JOIN (SELECT unnest([5, 10, 20]) AS eps_tenths)
            ORDER BY 1, eps_tenths"""))

  // ------------------------------------------------------------------- x351
  // Stream-join state advisor — the sizing table a Structured Streaming
  // deployment reads BEFORE launching a stream-stream join or windowed
  // dedup: for a 10-minute join window (equivalently, a 10-minute
  // watermark's retained state), the per-type state footprint is the
  // rolling count of events in the trailing 10 minutes. Computed exactly
  // over the event history — per (type, minute) counts, a RANGE window
  // summing the trailing 10 buckets, then max / nearest-rank-p95 /
  // mean-milli over OBSERVED minutes (gap minutes hold no state worth
  // provisioning for; the range frame still only credits buckets inside
  // the window across gaps). The max row is the executor-memory bound;
  // p95 is the autoscaling setpoint.
  //
  // Scale shape: the fact table collapses to the minute grid first
  // (map-side combinable); every window after that is minute-domain. The
  // RANGE frame is value-based, so sparse grids stay correct without
  // densification.
  private val x351 = GQuery(
    "x351_stream_state_advisor", "ext-streaming join-state sizing advisor",
    (s, dir) => {
      val m = events(s, dir)
        .groupBy(col("event_type"),
          expr("cast(unix_timestamp(ts) div 60 as bigint)").as("minute"))
        .agg(count(lit(1)).as("c"))
      val wRange = Window.partitionBy(col("event_type")).orderBy(col("minute"))
        .rangeBetween(-9, Window.currentRow)
      val st = m.withColumn("state_rows", sum(col("c")).over(wRange))
      val wRank = Window.partitionBy(col("event_type"))
        .orderBy(col("state_rows"), col("minute"))
      st.withColumn("rn", row_number().over(wRank).cast("long"))
        .withColumn("nm",
          count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(max(col("nm")).as("n_minutes"), sum(col("c")).as("n_events"),
          max(col("state_rows")).as("max_state_rows"),
          min(when(col("rn") * 20 >= col("nm") * 19, col("state_rows")))
            .as("p95_state_rows"),
          sum(col("state_rows").cast("decimal(38,0)")).as("sum_state"))
        .select(col("event_type"), col("n_minutes"), col("n_events"),
          col("max_state_rows"), col("p95_state_rows"),
          expr("cast((1000 * sum_state) div n_minutes as bigint)")
            .as("mean_state_milli"))
        .orderBy("event_type")
    },
    Some("""WITH m AS (
              SELECT event_type,
                epoch_us(ts) // 60000000 AS minute,
                CAST(COUNT(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2),
            st AS (
              SELECT *, CAST(SUM(c) OVER (PARTITION BY event_type
                  ORDER BY minute RANGE BETWEEN 9 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS state_rows
              FROM m),
            r AS (
              SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                  ORDER BY state_rows, minute) AS BIGINT) AS rn,
                CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nm
              FROM st)
            SELECT event_type, MAX(nm) AS n_minutes,
              CAST(SUM(c) AS BIGINT) AS n_events,
              MAX(state_rows) AS max_state_rows,
              MIN(CASE WHEN rn * 20 >= nm * 19 THEN state_rows END)
                AS p95_state_rows,
              CAST((1000 * SUM(CAST(state_rows AS HUGEINT))) // MAX(nm)
                AS BIGINT) AS mean_state_milli
            FROM r GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x353
  // A/B-test power advisor (the 16·σ²/δ² rule-of-thumb form of the
  // two-sample normal power calculation at α=0.05, power=0.8 — Lehr
  // 1992) — the sample-size table an experimenter reads next to the
  // x187 A/B readout: per event_type, the exact cent-variance of the
  // metric (floored-mean form, the x346 discipline) and the required
  // per-arm n at minimum-detectable-effect sizes of 1/2/5 % of the
  // mean, each a ceiling division of exact integers. Degenerate cells
  // (zero mean → zero delta) surface as NULL rather than a fabricated
  // n.
  //
  // Scale shape: one per-type rollup of (n, Σy, Σy²) off the fact table
  // (map-side combinable, DECIMAL(38,0) headroom), then a 3-row MDE
  // explode of the type-domain result.
  private val x353 = GQuery(
    "x353_ab_power_advisor", "ext-events experiment power advisor",
    (s, dir) => {
      events(s, dir)
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_obs"),
          sum(col("cents").cast("decimal(38,0)")).as("sc"),
          sum(col("cents").cast("decimal(38,0)") * col("cents")).as("q"))
        .withColumn("m", expr("cast(sc div n_obs as decimal(38,0))"))
        .withColumn("var_c2",
          expr("cast((q - 2 * m * sc + n_obs * m * m) div n_obs as bigint)"))
        .select(col("event_type"), col("n_obs"),
          expr("cast(m as bigint)").as("mean_cents"), col("var_c2"),
          explode(expr("array(10L, 20L, 50L)")).as("mde_milli"))
        .withColumn("delta_cents",
          expr("cast((cast(mean_cents as decimal(38,0)) * mde_milli) div 1000 as bigint)"))
        .withColumn("n_per_arm", expr(
          """cast(case when delta_cents > 0 then
               (16 * cast(var_c2 as decimal(38,0))
                + cast(delta_cents as decimal(38,0)) * delta_cents - 1)
               div (cast(delta_cents as decimal(38,0)) * delta_cents)
             end as bigint)"""))
        .orderBy("event_type", "mde_milli")
    },
    Some("""WITH g AS (
              SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
                SUM(CAST(CAST(round(value * 100, 0) AS BIGINT) AS HUGEINT))
                  AS sc,
                SUM(CAST(CAST(round(value * 100, 0) AS BIGINT) AS HUGEINT)
                  * CAST(round(value * 100, 0) AS BIGINT)) AS q
              FROM events GROUP BY 1),
            v AS (
              SELECT event_type, n_obs, sc // n_obs AS m,
                (q - 2 * (sc // n_obs) * sc
                 + n_obs * (sc // n_obs) * (sc // n_obs)) // n_obs AS var_c2
              FROM g)
            SELECT event_type, n_obs, CAST(m AS BIGINT) AS mean_cents,
              CAST(var_c2 AS BIGINT) AS var_c2,
              CAST(mde_milli AS BIGINT) AS mde_milli,
              CAST((m * mde_milli) // 1000 AS BIGINT) AS delta_cents,
              CAST(CASE WHEN (m * mde_milli) // 1000 > 0 THEN
                  (16 * var_c2 + ((m * mde_milli) // 1000)
                     * ((m * mde_milli) // 1000) - 1)
                  // (((m * mde_milli) // 1000) * ((m * mde_milli) // 1000))
                END AS BIGINT) AS n_per_arm
            FROM v CROSS JOIN (SELECT unnest([10, 20, 50]) AS mde_milli)
            ORDER BY 1, mde_milli"""))

  // ------------------------------------------------------------------- x357
  // Sample-ratio-mismatch guard (the SRM check of Fabijan et al. 2019 —
  // the first thing a trustworthy-experimentation platform tests, since
  // a biased assignment invalidates every downstream readout): users are
  // assigned to A/B by md5 parity (deterministic, cross-engine — the
  // x42 hash-sample discipline), and per event_type the χ² statistic
  // against the designed 50/50 split is exact integer arithmetic —
  // χ² = (n_A − n_B)²/(n_A + n_B) in micro units (the squared term in
  // DECIMAL(38,0)/HUGEINT — at 10⁹-user arms a BIGINT square wraps),
  // flagged at the df=1 α=0.05 critical value 3.841459. The experiment-health guard
  // completing the x187 (readout) / x353 (power) family.
  //
  // Scale shape: one (type, user) distinct-project, one type-domain
  // rollup; the χ² is a single floor division per type.
  /** Per-type distinct-user arm counts of the md5-parity A/B assignment
    * (the x42 hash-sample discipline) — the shared substrate of the x357
    * single-test SRM guard and the x367 Holm multiple-testing scan (the
    * x31 no-drift discipline: one assignment rule, two consumers; an
    * assignment-hash change can never desynchronize the scan from the
    * guard it extends). Returns (event_type, n_a, n_b).
    */
  private def srmArmCounts(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("arm", Experiment.arm)
      .groupBy(col("event_type"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"))

  private val x357 = GQuery(
    "x357_srm_guard", "ext-events experiment srm chi-square guard",
    (s, dir) => {
      srmArmCounts(s, dir)
        .withColumn("chi2_micro", expr(
          """cast((1000000 * cast(n_a - n_b as decimal(38,0))
                 * (n_a - n_b))
               div (n_a + n_b) as bigint)"""))
        .withColumn("srm_flag", col("chi2_micro") >= 3841459L)
        .orderBy("event_type")
    },
    Some("""WITH u AS (
              SELECT DISTINCT event_type, user_id FROM events),
            a AS (
              SELECT event_type,
                CAST(CAST(CONCAT('0x', substr(md5('a:' ||
                  CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
                  % 2 AS arm
              FROM u),
            g AS (
              SELECT event_type,
                CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_a,
                CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_b
              FROM a GROUP BY 1)
            SELECT event_type, n_a, n_b,
              CAST((1000000 * CAST(n_a - n_b AS HUGEINT) * (n_a - n_b))
                // (n_a + n_b) AS BIGINT) AS chi2_micro,
              (1000000 * CAST(n_a - n_b AS HUGEINT) * (n_a - n_b))
                // (n_a + n_b) >= 3841459 AS srm_flag
            FROM g ORDER BY 1"""))

  // ------------------------------------------------------------------- x359
  // Seasonality index table — the classical ratio-to-overall seasonal
  // index (the fixed-effects read the x161 decomposition implies but
  // never tabulates): per event_type, the day-of-week and hour-of-day
  // traffic indices in millis — 1000 = flat, the multiplier a capacity
  // plan or an anomaly baseline (x134's expected-volume denominator)
  // applies per calendar cell. Exact: index = (1000·cell_avg) div
  // overall_avg computed cross-multiplied as (1000·cell_cnt·n_cells_all)
  // div (total_cnt·n_cells_obs)... simpler and exact: per (type, dim,
  // cell): index_milli = (1000·cnt·n_cells) div total — the cell's
  // share of traffic against a uniform share, all integers (n_cells =
  // observed cells of that dim, so sparse calendars stay honest).
  //
  // Scale shape: one fact rollup to (type, dim, cell) — calendar-domain
  // — then type×dim-partitioned windows. Output is calendar-sized.
  private val x359 = GQuery(
    "x359_seasonality_index", "ext-events seasonal index table",
    (s, dir) => {
      val cells = events(s, dir)
        .select(col("event_type"), explode(expr(
          """array(
               named_struct('dim', 'dow', 'cell',
                 cast(dayofweek(ts) as string)),
               named_struct('dim', 'hour', 'cell',
                 cast(hour(ts) as string)))""")).as("x"))
        .select(col("event_type"), col("x.dim").as("dim"),
          col("x.cell").as("cell"))
        .groupBy(col("event_type"), col("dim"), col("cell"))
        .agg(count(lit(1)).as("cnt"))
      val wTD = Window.partitionBy(col("event_type"), col("dim"))
      cells
        .withColumn("total", sum(col("cnt")).over(wTD))
        .withColumn("n_cells", count(lit(1)).over(wTD))
        .select(col("event_type"), col("dim"),
          col("cell").cast("long").as("cell"), col("cnt"),
          expr("""cast((1000 * cast(cnt as decimal(38,0)) * n_cells)
               div total as bigint)""").as("index_milli"))
        .orderBy("event_type", "dim", "cell")
    },
    Some("""WITH cells AS (
              SELECT event_type, dim, cell, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM (
                -- Spark dayofweek is 1-7 (Sun=1); DuckDB's is 0-6 — shift
                SELECT event_type, 'dow' AS dim,
                  CAST(dayofweek(ts) + 1 AS VARCHAR) AS cell FROM events
                UNION ALL
                SELECT event_type, 'hour',
                  CAST(hour(ts) AS VARCHAR) FROM events)
              GROUP BY 1, 2, 3),
            w AS (
              SELECT *, CAST(SUM(cnt) OVER (PARTITION BY event_type, dim)
                  AS BIGINT) AS total,
                CAST(COUNT(*) OVER (PARTITION BY event_type, dim)
                  AS BIGINT) AS n_cells
              FROM cells)
            SELECT event_type, dim, CAST(cell AS BIGINT) AS cell, cnt,
              CAST((1000 * CAST(cnt AS HUGEINT) * n_cells) // total
                AS BIGINT) AS index_milli
            FROM w ORDER BY 1, 2, 3"""))

  // ------------------------------------------------------------------- x361
  // Shapley-value channel attribution (Shapley 1953; the coalition-game
  // read of multi-touch credit that x49 answers with one touch and x269
  // with a decay heuristic): channels are the non-conversion event
  // types, a converted user's COALITION is the set of channels they
  // touched before their first purchase, and the value function
  // v(S) = |converted users whose touch-set ⊆ S| — the "reach" form
  // used by marketing-science platforms (monotone by construction, so
  // every marginal is non-negative). With |N| = 4 channels the exact
  // Shapley sum is 8 marginals per channel weighted |S|!(n−|S|−1)!;
  // kept integer by carrying φ·4! = φ·24 (weights 6/2/2/6), so the
  // whole attribution — normally a float expectation — hash-verifies.
  // Efficiency (Σφ = v(N) − v(∅)) is pinned in ExperimentSemanticsSpec.
  // Users with zero pre-purchase touches form v(∅), the baseline credit
  // Shapley assigns to no channel. The channel universe is the
  // configured experiment surface (production passes its own list; the
  // 2^|N| lattice is code-generated from ONE Seq that also renders the
  // oracle, so the two engines can never disagree about subset order).
  //
  // Scale shape: one user-keyed flag aggregate (4 map-side-combinable
  // MAXes), ONE 16-column global rollup (no lattice join — the subset
  // indicators are closed-form over the flags), then constant-row
  // arithmetic and a 4-row stack. Nothing fact-sized ever pairs.
  private val shapChannels = Seq("click", "error", "signup", "view")
  private val shapSubsets: Seq[Seq[String]] =
    shapChannels.foldLeft(Seq(Seq.empty[String]))((acc, c) => acc ++ acc.map(_ :+ c))
  private def shapKey(ss: Seq[String]): String = "v_" + ss.map(_.head).mkString
  /** |S|!·(n−|S|−1)! for n = 4 — the Shapley weight, ×4! to stay integer. */
  private val shapW24 = Map(0 -> 6L, 1 -> 2L, 2 -> 2L, 3 -> 6L)
  private def shapPhiExpr(ch: String): String =
    shapSubsets.filterNot(_.contains(ch)).map { ss =>
      val withCh = shapChannels.filter(c => ss.contains(c) || c == ch)
      s"${shapW24(ss.size)} * (${shapKey(withCh)} - ${shapKey(ss)})"
    }.mkString(" + ")
  private def shapVCond(ss: Seq[String]): String = {
    val excluded = shapChannels.filterNot(ss.contains)
    if (excluded.isEmpty) "1 = 1"
    else excluded.map(c => s"t_$c = 0").mkString(" AND ")
  }

  private val x361 = GQuery(
    "x361_shapley_attribution", "ext-events attribution shapley exact",
    (s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val firstP = e.where(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("us")).as("pus"))
      val flagAggs = shapChannels.map(c =>
        max(when(col("event_type") === c, 1L).otherwise(0L)).as(s"t_$c"))
      val flags = e.join(firstP, Seq("user_id"))
        .where(col("us") < col("pus") && col("event_type") =!= "purchase")
        .groupBy(col("user_id"))
        .agg(flagAggs.head, flagAggs.tail: _*)
      val users = firstP.join(flags, Seq("user_id"), "left")
        .select(shapChannels.map(c =>
          coalesce(col(s"t_$c"), lit(0L)).as(s"t_$c")): _*)
      val vAggs = shapSubsets.map(ss =>
        sum(expr(s"case when ${shapVCond(ss)} then 1L else 0L end"))
          .as(shapKey(ss)))
      val v = users.agg(vAggs.head, vAggs.tail: _*)
      v.select(shapChannels.map(c => expr(shapPhiExpr(c)).as(s"phi_$c")) ++
          Seq(col(shapKey(shapChannels)).as("n_conv"),
            col(shapKey(Nil)).as("baseline")): _*)
        .selectExpr(
          s"stack(4, ${shapChannels.map(c => s"'$c', phi_$c").mkString(", ")})" +
            " as (channel, phi_x24)",
          "n_conv", "baseline")
        .withColumn("share_micro", expr(
          """cast(case when n_conv > baseline then
               (1000000 * phi_x24) div (24 * (n_conv - baseline))
             end as bigint)"""))
        .orderBy("channel")
    },
    Some(s"""WITH e AS (
               SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
             fp AS (
               SELECT user_id, MIN(us) AS pus FROM e
               WHERE event_type = 'purchase' GROUP BY 1),
             tf AS (
               SELECT e.user_id,
                 ${shapChannels.map(c =>
                   s"MAX(CASE WHEN e.event_type = '$c' THEN 1 ELSE 0 END) AS t_$c")
                   .mkString(",\n                 ")}
               FROM e JOIN fp USING (user_id)
               WHERE e.us < fp.pus AND e.event_type <> 'purchase'
               GROUP BY 1),
             u AS (
               SELECT ${shapChannels.map(c => s"COALESCE(t_$c, 0) AS t_$c")
                 .mkString(", ")}
               FROM fp LEFT JOIN tf USING (user_id)),
             v AS (
               SELECT ${shapSubsets.map(ss =>
                 s"CAST(SUM(CASE WHEN ${shapVCond(ss)} THEN 1 ELSE 0 END) AS BIGINT) AS ${shapKey(ss)}")
                 .mkString(",\n               ")}
               FROM u),
             p AS (
               SELECT ${shapChannels.map(c => s"${shapPhiExpr(c)} AS phi_$c")
                 .mkString(",\n               ")},
                 ${shapKey(shapChannels)} AS n_conv, v_ AS baseline
               FROM v)
             SELECT channel, phi_x24,
               CAST(CASE WHEN n_conv > baseline THEN
                   (1000000 * phi_x24) // (24 * (n_conv - baseline))
                 END AS BIGINT) AS share_micro,
               n_conv, baseline
             FROM (SELECT
                 unnest([${shapChannels.map(c => s"'$c'").mkString(", ")}])
                   AS channel,
                 unnest([${shapChannels.map(c => s"phi_$c").mkString(", ")}])
                   AS phi_x24,
                 n_conv, baseline FROM p)
             ORDER BY channel"""))

  // ------------------------------------------------------------------- x362
  // CUPED variance reduction (Deng, Xu, Kohavi & Walker WSDM 2013 — the
  // standard pre-experiment-covariate adjustment every mature A/B
  // platform applies before reading x187/x353): each user's PRE-period
  // spend (first half of the corpus window, exact integer midpoint of
  // the us span) is the covariate X, the POST-period spend the metric
  // Y, arms by the x357 md5-parity assignment. θ = Cov(X,Y)/Var(X) is
  // computed POOLED (the unbiased choice — θ from the pooled sample is
  // independent of assignment under SRM-clean randomization), quantized
  // ONCE to micros (integer floor of cross-multiplied DECIMAL(38,0)
  // moments — the x270 headroom discipline), and each arm's adjusted
  // mean ŷ_a − θ(x̄_a − x̄) follows with integer cross-multiplied
  // divisions only: a float regression adjustment that hash-verifies.
  // Both engines truncate integer division toward zero, so the signed
  // θ and signed imbalance terms stay cross-engine exact. A zero
  // pre-period variance (vden = 0) yields NULL θ and NULL adjusted
  // means in BOTH engines (the x270 det_zero discipline).
  //
  // Scale shape: one fact scan to per-user (x, y) cents, one 5-moment
  // pooled rollup + one 3-moment per-arm rollup (both map-side
  // combinable), arithmetic on 2 rows. The moment cross-products ride
  // DECIMAL(38,0)/HUGEINT (exact to ~10⁸ users at 10⁶-cent user spend;
  // beyond that the θ quantization order keeps every product < 10³⁸).
  private val x362 = GQuery(
    "x362_cuped_adjustment", "ext-events experiment cuped adjustment",
    (s, dir) => {
      val e = events(s, dir).select(col("user_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      val span = e.agg(min(col("us")).as("t0"), max(col("us")).as("t1"))
      val per = e.crossJoin(broadcast(span))
        .withColumn("mid", expr("t0 + (t1 - t0) div 2"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("us") < col("mid"), col("cents")).otherwise(0L)).as("x"),
          sum(when(col("us") >= col("mid"), col("cents")).otherwise(0L)).as("y"))
        .withColumn("arm", Experiment.arm)
        .localCheckpoint(true) // pooled moments + per-arm rollup both read it
      val g = per.agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
        .withColumn("theta_micro", expr(
          """cast(case when n * sxx - sx * sx > 0 then
               (1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)
             end as bigint)"""))
      per.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("x").cast("decimal(38,0)")).as("sxa"),
          sum(col("y").cast("decimal(38,0)")).as("sya"))
        .crossJoin(broadcast(g.select(col("n"), col("sx"), col("theta_micro"))))
        .select(col("arm"), col("n_users"),
          expr("cast(sya as bigint)").as("sum_y_cents"),
          expr("cast((1000000 * sya) div n_users as bigint)").as("mean_y_micro"),
          col("theta_micro"),
          expr("""cast((1000000 * sya) div n_users
               - (theta_micro * (sxa * n - sx * n_users)) div (n_users * n)
             as bigint)""").as("mean_adj_micro"))
        .orderBy("arm")
    },
    Some("""WITH e AS (
              SELECT user_id, epoch_us(ts) AS us,
                CAST(round(value * 100, 0) AS BIGINT) AS cents
              FROM events),
            sp AS (SELECT MIN(us) AS t0, MAX(us) AS t1 FROM e),
            per AS (
              SELECT user_id,
                SUM(CASE WHEN us < t0 + (t1 - t0) // 2 THEN cents
                  ELSE 0 END) AS x,
                SUM(CASE WHEN us >= t0 + (t1 - t0) // 2 THEN cents
                  ELSE 0 END) AS y
              FROM e, sp GROUP BY 1),
            pa AS (
              SELECT CAST(x AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y,
                CAST(CAST(CONCAT('0x', substr(md5('a:' ||
                  CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
                  % 2 AS arm
              FROM per),
            g AS (
              SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx,
                SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
              FROM pa),
            t AS (
              SELECT n, sx,
                CASE WHEN n * sxx - sx * sx > 0 THEN
                  (1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
                END AS theta_micro
              FROM g),
            a AS (
              SELECT arm, CAST(COUNT(*) AS HUGEINT) AS n_users,
                SUM(x) AS sxa, SUM(y) AS sya
              FROM pa GROUP BY 1)
            SELECT CAST(arm AS BIGINT) AS arm,
              CAST(n_users AS BIGINT) AS n_users,
              CAST(sya AS BIGINT) AS sum_y_cents,
              CAST((1000000 * sya) // n_users AS BIGINT) AS mean_y_micro,
              CAST(theta_micro AS BIGINT) AS theta_micro,
              CAST((1000000 * sya) // n_users
                - (theta_micro * (sxa * n - sx * n_users)) // (n_users * n)
                AS BIGINT) AS mean_adj_micro
            FROM a, t ORDER BY arm"""))

  // ------------------------------------------------------------------- x367
  // Holm–Bonferroni SRM scan (Holm 1979) — x357 tests each event_type's
  // assignment at α = 0.05 ALONE; scanning five types that way inflates
  // the family-wise false-alarm rate to ~23 %. The step-down procedure
  // orders the χ² statistics largest-first (smallest p first) and tests
  // step k against α/(m−k+1), stopping at the first acceptance — the
  // uniformly-more-powerful-than-Bonferroni guard a platform runs over
  // its whole experiment surface. Exact: χ² in micros over the SAME
  // srmArmCounts substrate as x357 (one assignment rule, two
  // consumers), critical values a literal df=1 ladder for α/1…α/10
  // (χ²₁ criticals = z²_{1−α/2j}). Ranks needing α/j beyond the ladder
  // (m>10 ⇒ the TOP ranks need criticals STRICTER than the α/10 rung)
  // ABSTAIN: crit is NULL and pass=0, so the step-down stops and the
  // scan never rejects at m>10 — truly FWER-conservative. (The r12 form
  // clamped those ranks to the α/10 rung, which is LOOSER than exact
  // Holm's α/(m−k+1) there — anti-conservative, the opposite of what
  // its comment claimed; r13 ADVICE.) The sequential stop is a
  // running-minimum window over the pass indicator. Holm rejection
  // implies the x357 single-test flag (crit ≥ 3841459 everywhere) —
  // pinned in ExperimentSemanticsSpec.
  //
  // Scale shape: srmArmCounts' one distinct-project + type rollup; the
  // scan itself is |types|-domain window arithmetic.
  private val x367 = GQuery(
    "x367_holm_srm_scan", "ext-events experiment holm step-down scan",
    (s, dir) => {
      val wR = Window.orderBy(col("chi2_micro").desc, col("event_type"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val wRun = Window.orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
      srmArmCounts(s, dir)
        .withColumn("chi2_micro", expr(
          """cast((1000000 * cast(n_a - n_b as decimal(38,0)) * (n_a - n_b))
               div (n_a + n_b) as bigint)"""))
        .withColumn("rank", row_number().over(wR).cast("long"))
        .withColumn("m", count(lit(1)).over(wAll).cast("long"))
        // m>10 guard (r13, replacing the r12 clamp): steps whose Holm
        // index m−k+1 exceeds the ladder would need a critical STRICTER
        // than the α/10 rung, so borrowing any tabulated rung is
        // anti-conservative. Those steps abstain — crit NULL, pass=0 —
        // and the running-min stop makes the whole scan non-rejecting
        // at m>10. Same abstention in the oracle.
        .withColumn("crit_micro", expr(
          """case when m - rank + 1 <= 10 then
               element_at(array(3841459L, 5023886L, 5731139L,
                 6238533L, 6634897L, 6960401L, 7236689L, 7476773L,
                 7689093L, 7879439L),
               cast(m - rank + 1 as int)) end"""))
        .withColumn("pass",
          when(col("crit_micro").isNotNull &&
            col("chi2_micro") >= col("crit_micro"), 1L).otherwise(0L))
        .withColumn("holm_reject", min(col("pass")).over(wRun) === 1L)
        .select(col("event_type"), col("n_a"), col("n_b"), col("chi2_micro"),
          col("rank"), col("crit_micro"), col("holm_reject"))
        .orderBy("rank")
    },
    Some("""WITH u AS (
              SELECT DISTINCT event_type, user_id FROM events),
            a AS (
              SELECT event_type,
                CAST(CAST(CONCAT('0x', substr(md5('a:' ||
                  CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
                  % 2 AS arm
              FROM u),
            g AS (
              SELECT event_type,
                CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_a,
                CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_b
              FROM a GROUP BY 1),
            c AS (
              SELECT event_type, n_a, n_b,
                CAST((1000000 * CAST(n_a - n_b AS HUGEINT) * (n_a - n_b))
                  // (n_a + n_b) AS BIGINT) AS chi2_micro
              FROM g),
            r AS (
              SELECT *,
                CAST(ROW_NUMBER() OVER (ORDER BY chi2_micro DESC, event_type)
                  AS BIGINT) AS rank,
                CAST(COUNT(*) OVER () AS BIGINT) AS m
              FROM c),
            k AS (
              SELECT *,
                CASE WHEN m - rank + 1 <= 10 THEN
                  ([3841459, 5023886, 5731139, 6238533, 6634897, 6960401,
                    7236689, 7476773, 7689093, 7879439])[m - rank + 1]
                END AS crit_micro,
                CASE WHEN m - rank + 1 <= 10 AND chi2_micro >=
                  ([3841459, 5023886, 5731139, 6238533, 6634897, 6960401,
                    7236689, 7476773, 7689093, 7879439])[m - rank + 1]
                  THEN 1 ELSE 0 END AS pass
              FROM r)
            SELECT event_type, n_a, n_b, chi2_micro, rank,
              CAST(crit_micro AS BIGINT) AS crit_micro,
              MIN(pass) OVER (ORDER BY rank
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                AS holm_reject
            FROM k ORDER BY rank"""))

  // ------------------------------------------------------------------- x368
  // Nelson–Aalen cumulative hazard (Nelson 1972, Aalen 1978) — the
  // ADDITIVE twin of x218's product-limit curve over the identical
  // survivalRiskTable: Ĥ(t) = Σ_{t_i ≤ t} d_i/n_i, the estimator
  // survival texts read next to Kaplan–Meier (S ≈ e^{−H}) and the one
  // whose increments are directly interpretable as per-day conversion
  // hazard. Because it is a SUM (not a product), no sequential fold is
  // needed: per-step hazard quantizes to micros by one integer
  // division and the curve is a running-sum window — simpler plan than
  // x218, same risk substrate (the shared helper makes disagreement
  // about who-is-at-risk-when structurally impossible).
  //
  // Scale shape: x218's — one per-user aggregate, then duration-day
  // domain windows only.
  private val x368 = GQuery(
    "x368_nelson_aalen", "ext-events survival nelson-aalen hazard",
    (s, dir) => {
      val wC = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
      survivalRiskTable(s, dir)
        .withColumn("h_step_micro", expr("(1000000 * d) div n_risk"))
        .withColumn("h_cum_micro", sum(col("h_step_micro")).over(wC))
        .orderBy("t")
    },
    Some("""WITH pu AS (
              SELECT user_id,
                MIN(CASE WHEN event_type = 'view'
                  THEN CAST(date_trunc('day', ts) AS DATE) END) AS first_view,
                MIN(CASE WHEN event_type = 'purchase'
                  THEN CAST(date_trunc('day', ts) AS DATE) END) AS first_purchase
              FROM events WHERE event_type IN ('view', 'purchase')
              GROUP BY 1),
            h AS (SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS hmax
                  FROM events),
            dur AS (
              SELECT CASE WHEN pu.first_purchase IS NOT NULL
                  AND pu.first_purchase >= pu.first_view
                THEN CAST(date_diff('day', pu.first_view, pu.first_purchase)
                  AS BIGINT)
                ELSE CAST(date_diff('day', pu.first_view, h.hmax) AS BIGINT)
                END AS t,
                (pu.first_purchase IS NOT NULL
                  AND pu.first_purchase >= pu.first_view) AS converted
              FROM pu, h WHERE pu.first_view IS NOT NULL),
            byday AS (
              SELECT t,
                CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS d,
                CAST(SUM(CASE WHEN converted THEN 0 ELSE 1 END) AS BIGINT) AS c
              FROM dur GROUP BY 1),
            risk AS (
              SELECT t, d, c,
                CAST(SUM(d + c) OVER () AS BIGINT)
                  - COALESCE(CAST(SUM(d + c) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS n_risk
              FROM byday)
            SELECT t, n_risk, d, c,
              (1000000 * d) // n_risk AS h_step_micro,
              CAST(SUM((1000000 * d) // n_risk) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS h_cum_micro
            FROM risk ORDER BY t"""))

  // ------------------------------------------------------------------- x369
  // Cumulative gains / lift table — the targeting-model readout next to
  // the threshold-free x219 AUC and the threshold-point x253 F1: users
  // ranked by a LEAKAGE-FREE engagement score (non-purchase event count
  // — ranking by spend would leak purchases into their own label),
  // cut into NTILE(10) deciles under a deterministic total order
  // (score desc, user_id), and per decile the cumulative capture rate
  // (share of all converters found so far) and lift vs random
  // targeting — both cross-multiplied exact integers. "Target the top
  // 3 deciles" decisions read off this table; AUC alone can't price a
  // campaign cutoff. NTILE follows the SQL-standard distribution (first
  // n mod k buckets one larger) in both engines, so the decile edges
  // hash-match.
  //
  // Scale shape: one fact scan to per-user (score, label), one
  // dimension-sized rank window, a 10-row rollup + cumulative windows
  // on the decile domain.
  private val x369 = GQuery(
    "x369_gains_table", "ext-events targeting gains lift table",
    (s, dir) => {
      val per = events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
            .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("pos"))
      val wR = Window.orderBy(col("score").desc, col("user_id"))
      val wCum = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      per
        .withColumn("decile", ntile(10).over(wR).cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("pos")).as("n_pos"))
        .withColumn("cum_users", sum(col("n_users")).over(wCum))
        .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
        .withColumn("tot_users", sum(col("n_users")).over(wAll))
        .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
        .select(col("decile"), col("n_users"), col("n_pos"), col("cum_pos"),
          expr("""cast(case when tot_pos > 0
               then (1000 * cum_pos) div tot_pos end as bigint)""")
            .as("capture_milli"),
          // lift numerator is n²-sized (cum_pos·tot_users ~ 10¹⁸ at 10⁹
          // users, ×1000 wraps BIGINT) — DECIMAL(38,0)/HUGEINT headroom.
          // Guard on tot_pos ALONE (r11 ADVICE): cum_users ≥ 1 for every
          // decile by construction (ntile never yields an empty bucket),
          // and the old raw-BIGINT product cum_users*tot_pos was itself
          // the n²-sized overflow the adjacent comment warns about.
          expr("""cast(case when tot_pos > 0
               then (1000 * cast(cum_pos as decimal(38,0)) * tot_users)
                 div (cast(cum_users as decimal(38,0)) * tot_pos)
             end as bigint)""").as("lift_milli"))
        .orderBy("decile")
    },
    Some("""WITH per AS (
              SELECT user_id,
                CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1
                  ELSE 0 END) AS BIGINT) AS score,
                CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1
                  ELSE 0 END) AS BIGINT) AS pos
              FROM events GROUP BY 1),
            d AS (
              SELECT score, pos,
                CAST(NTILE(10) OVER (ORDER BY score DESC, user_id)
                  AS BIGINT) AS decile
              FROM per),
            g AS (
              SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
                CAST(SUM(pos) AS BIGINT) AS n_pos
              FROM d GROUP BY 1),
            c AS (
              SELECT *,
                CAST(SUM(n_users) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_users,
                CAST(SUM(n_pos) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_pos,
                CAST(SUM(n_users) OVER () AS BIGINT) AS tot_users,
                CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos
              FROM g)
            SELECT decile, n_users, n_pos, cum_pos,
              CAST(CASE WHEN tot_pos > 0
                THEN (1000 * cum_pos) // tot_pos END AS BIGINT)
                AS capture_milli,
              CAST(CASE WHEN tot_pos > 0
                THEN (1000 * CAST(cum_pos AS HUGEINT) * tot_users)
                  // (CAST(cum_users AS HUGEINT) * tot_pos)
                END AS BIGINT) AS lift_milli
            FROM c ORDER BY decile"""))

  // ------------------------------------------------------------------- x373
  // Attribution model sensitivity — first-touch, last-touch and linear
  // credit side by side over x269's EXACT touch window (same 7-day
  // user-keyed join, the x31 no-drift discipline), the table a budget
  // owner reads before trusting ANY single attribution model: when the
  // channel ranking flips between models, the model choice — not the
  // data — is driving the budget. Completes the attribution family
  // (x49 strict funnel, x269 time-decay, x361 Shapley) with the three
  // industry-default heuristics, all exact: first/last are rank-1
  // indicators under deterministic (us, event_id) orders, linear is the
  // same per-conversion integer split as x269's normalizer (truncation
  // stays inside each conversion).
  //
  // Scale shape: x269's — user-keyed conversion×touch join with a
  // range predicate (per-user-bounded fan-out), conversion-keyed
  // windows, one |types|-domain rollup.
  private val x373 = GQuery(
    "x373_attribution_sensitivity", "ext-events attribution model comparison",
    (s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      val conv = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("cus"),
          col("event_id").as("conv_id"))
      val touches = e.join(conv, Seq("user_id"))
        .where(col("us") < col("cus")
          && col("us") >= col("cus") - lit(7L * 86400000000L))
      val wAsc = Window.partitionBy("conv_id")
        .orderBy(col("us"), col("event_id"))
      val wDesc = Window.partitionBy("conv_id")
        .orderBy(col("us").desc, col("event_id").desc)
      val wAll = Window.partitionBy("conv_id")
      touches
        .withColumn("rn_f", row_number().over(wAsc))
        .withColumn("rn_l", row_number().over(wDesc))
        .withColumn("cnt", count(lit(1)).over(wAll))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_touches"),
          sum(when(col("rn_f") === 1, 1000000L).otherwise(0L))
            .as("first_micro"),
          sum(when(col("rn_l") === 1, 1000000L).otherwise(0L))
            .as("last_micro"),
          sum(expr("1000000 div cnt")).as("linear_micro"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
              SELECT user_id, event_type, epoch_us(ts) AS us, event_id
              FROM events),
            conv AS (
              SELECT user_id, us AS cus, event_id AS conv_id
              FROM e WHERE event_type = 'purchase'),
            touches AS (
              SELECT t.event_type, c.conv_id, t.us, t.event_id
              FROM e t JOIN conv c ON c.user_id = t.user_id
              WHERE t.us < c.cus AND t.us >= c.cus - 7 * 86400000000),
            r AS (
              SELECT event_type,
                ROW_NUMBER() OVER (PARTITION BY conv_id
                  ORDER BY us, event_id) AS rn_f,
                ROW_NUMBER() OVER (PARTITION BY conv_id
                  ORDER BY us DESC, event_id DESC) AS rn_l,
                COUNT(*) OVER (PARTITION BY conv_id) AS cnt
              FROM touches)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
              CAST(SUM(CASE WHEN rn_f = 1 THEN 1000000 ELSE 0 END)
                AS BIGINT) AS first_micro,
              CAST(SUM(CASE WHEN rn_l = 1 THEN 1000000 ELSE 0 END)
                AS BIGINT) AS last_micro,
              CAST(SUM(1000000 // cnt) AS BIGINT) AS linear_micro
            FROM r GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x374
  // Winsorized A/B readout — the heavy-tail-robust experiment metric
  // next to x187 (proportions), x353 (power) and x362 (CUPED): per-user
  // spend clipped at the POOLED 5th/95th percentiles before the arm
  // means, the standard guard against one whale user deciding the
  // experiment (x149 winsorizes a column for analytics; this is the
  // experiment-readout form, clipping at pooled — not per-arm —
  // thresholds so the clip itself cannot introduce an arm asymmetry).
  // Thresholds by x278's lower nearest-rank convention on a rank
  // window (first value whose cumulative rank crosses p·n), arms by
  // the x357 md5-parity assignment; both raw and winsorized means
  // emitted so the whale's leverage is the readable payload. All
  // integer cents and floor divisions.
  //
  // Scale shape: one fact scan to per-user spend, one dimension-sized
  // rank window for the two thresholds, a 2-row arm rollup.
  private val x374 = GQuery(
    "x374_winsorized_ab", "ext-events experiment winsorized readout",
    (s, dir) => {
      val per = events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"))
        .withColumn("arm", Experiment.arm)
      val wR = Window.orderBy(col("spend"), col("user_id"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val ranked = per
        .withColumn("rn", row_number().over(wR).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .localCheckpoint(true) // threshold fold + arm rollup
      val thr = ranked
        .agg(min(when(col("rn") * 1000 >= col("n") * 50, col("spend")))
            .as("lo_cents"),
          min(when(col("rn") * 1000 >= col("n") * 950, col("spend")))
            .as("hi_cents"))
      ranked.crossJoin(broadcast(thr))
        .withColumn("w", greatest(least(col("spend"), col("hi_cents")),
          col("lo_cents")))
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("spend")).as("sum_cents"),
          sum(col("w")).as("sum_w_cents"),
          min(col("lo_cents")).as("lo_cents"),
          min(col("hi_cents")).as("hi_cents"))
        .select(col("arm"), col("n_users"), col("lo_cents"), col("hi_cents"),
          expr("cast((1000000 * sum_cents) div n_users as bigint)")
            .as("mean_micro"),
          expr("cast((1000000 * sum_w_cents) div n_users as bigint)")
            .as("mean_winsor_micro"))
        .orderBy("arm")
    },
    Some("""WITH per AS (
              SELECT user_id,
                CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                  AS spend
              FROM events GROUP BY 1),
            pa AS (
              SELECT user_id, spend,
                CAST(CAST(CONCAT('0x', substr(md5('a:' ||
                  CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
                  % 2 AS arm
              FROM per),
            rk AS (
              SELECT *,
                CAST(ROW_NUMBER() OVER (ORDER BY spend, user_id)
                  AS BIGINT) AS rn,
                CAST(COUNT(*) OVER () AS BIGINT) AS n
              FROM pa),
            thr AS (
              SELECT
                MIN(CASE WHEN rn * 1000 >= n * 50 THEN spend END)
                  AS lo_cents,
                MIN(CASE WHEN rn * 1000 >= n * 950 THEN spend END)
                  AS hi_cents
              FROM rk)
            SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
              CAST(MIN(thr.lo_cents) AS BIGINT) AS lo_cents,
              CAST(MIN(thr.hi_cents) AS BIGINT) AS hi_cents,
              CAST((1000000 * SUM(spend)) // COUNT(*) AS BIGINT)
                AS mean_micro,
              CAST((1000000 * SUM(greatest(least(spend, thr.hi_cents),
                  thr.lo_cents))) // COUNT(*) AS BIGINT)
                AS mean_winsor_micro
            FROM rk CROSS JOIN thr
            GROUP BY arm ORDER BY arm"""))

  // ------------------------------------------------------------------- x375
  // Quantile treatment effects — the DISTRIBUTIONAL experiment readout
  // completing the robust family (x187 proportions, x374 winsorized
  // mean, x362 CUPED): per arm, exact lower-nearest-rank quantiles of
  // per-user spend at p ∈ {250, 500, 750, 900}‰ and the per-quantile
  // arm difference. A treatment that moves only the tail (or only the
  // median) is invisible to any single mean; the QTE row is how that
  // reads. Arms by the x357 md5-parity assignment; ranks are
  // ARM-PARTITIONED windows under a deterministic (spend, user_id)
  // order; the quantile pick is the x240/x374 cumulative-crossing
  // convention, all integer cross-multiplication.
  //
  // Scale shape: one fact scan to per-user spend, arm-partitioned rank
  // windows (dimension-sized), a (p × arm)-domain rollup pivoted to
  // one row per p.
  private val x375 = GQuery(
    "x375_quantile_treatment_effects", "ext-events experiment qte",
    (s, dir) => {
      val wR = Window.partitionBy("arm").orderBy(col("spend"), col("user_id"))
      val wN = Window.partitionBy("arm")
      val picks = events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"))
        .withColumn("arm", Experiment.arm)
        .withColumn("rn", row_number().over(wR).cast("long"))
        .withColumn("n", count(lit(1)).over(wN).cast("long"))
        .select(col("arm"), col("spend"), col("rn"), col("n"),
          explode(expr("array(250L, 500L, 750L, 900L)")).as("p_milli"))
        .where(col("rn") * 1000 >= col("n") * col("p_milli"))
        .groupBy(col("p_milli"), col("arm"))
        .agg(min(col("spend")).as("q_cents"))
      picks.groupBy(col("p_milli"))
        .agg(min(when(col("arm") === 0L, col("q_cents"))).as("q_a_cents"),
          min(when(col("arm") === 1L, col("q_cents"))).as("q_b_cents"))
        .withColumn("qte_cents", col("q_b_cents") - col("q_a_cents"))
        .orderBy("p_milli")
    },
    Some("""WITH per AS (
              SELECT user_id,
                CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                  AS spend
              FROM events GROUP BY 1),
            pa AS (
              SELECT user_id, spend,
                CAST(CAST(CONCAT('0x', substr(md5('a:' ||
                  CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
                  % 2 AS arm
              FROM per),
            rk AS (
              SELECT *,
                CAST(ROW_NUMBER() OVER (PARTITION BY arm
                  ORDER BY spend, user_id) AS BIGINT) AS rn,
                CAST(COUNT(*) OVER (PARTITION BY arm) AS BIGINT) AS n
              FROM pa),
            picks AS (
              SELECT p_milli, arm, MIN(spend) AS q_cents
              FROM rk CROSS JOIN
                (SELECT CAST(unnest([250, 500, 750, 900]) AS BIGINT)
                   AS p_milli)
              WHERE rn * 1000 >= n * p_milli
              GROUP BY 1, 2)
            SELECT p_milli,
              CAST(MIN(CASE WHEN arm = 0 THEN q_cents END) AS BIGINT)
                AS q_a_cents,
              CAST(MIN(CASE WHEN arm = 1 THEN q_cents END) AS BIGINT)
                AS q_b_cents,
              CAST(MIN(CASE WHEN arm = 1 THEN q_cents END)
                - MIN(CASE WHEN arm = 0 THEN q_cents END) AS BIGINT)
                AS qte_cents
            FROM picks GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x378
  // Two-sample log-rank test (Mantel 1966; Peto & Peto 1972) — the
  // significance readout OVER the x218/x368 survival family: does arm B
  // convert on a different time-to-purchase curve than arm A? Built on
  // the same first-view → first-purchase duration substrate split by
  // the ONE Experiment.arm rule; per event day t the observed-minus-
  // expected arm-A deaths O−E = d_a − d·n_a/n and the hypergeometric
  // variance d·(n_a/n)·(n_b/n)·(n−d)/(n−1), micro-quantized with the
  // x228 discipline (the two risk shares quantize ONCE each; every
  // division is integer); the running χ² = (Σ O−E)²/Σ Var is the test.
  // DECIMAL(38,0) headroom on the variance product and the squared
  // cumulative (both n²-sized at 10⁹ users).
  //
  // Scale shape: one per-user aggregate (shuffles on user_id), then
  // duration-day DOMAIN windows only — same plan family as x218/x368.
  private val x378 = GQuery(
    "x378_logrank_test", "ext-events survival logrank experiment",
    (s, dir) => {
      val wPrev = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val wCum = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
      val perUser = events(s, dir)
        .where(col("event_type").isin("view", "purchase"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view",
            date_trunc("day", col("ts")).cast("date"))).as("fv"),
          min(when(col("event_type") === "purchase",
            date_trunc("day", col("ts")).cast("date"))).as("fp"))
        .where(col("fv").isNotNull)
        .withColumn("arm", Experiment.arm)
      val horizon = events(s, dir)
        .agg(max(date_trunc("day", col("ts")).cast("date")).as("hmax"))
      val dur = perUser.crossJoin(broadcast(horizon))
        .select(
          when(col("fp").isNotNull && col("fp") >= col("fv"),
            datediff(col("fp"), col("fv")))
            .otherwise(datediff(col("hmax"), col("fv")))
            .cast("long").as("t"),
          (col("fp").isNotNull && col("fp") >= col("fv")).as("conv"),
          col("arm"))
      dur.groupBy("t")
        .agg(
          sum(when(col("conv") && col("arm") === 0L, 1L).otherwise(0L)).as("d_a"),
          sum(when(col("conv") && col("arm") === 1L, 1L).otherwise(0L)).as("d_b"),
          sum(when(!col("conv") && col("arm") === 0L, 1L).otherwise(0L)).as("c_a"),
          sum(when(!col("conv") && col("arm") === 1L, 1L).otherwise(0L)).as("c_b"))
        .withColumn("n_a", sum(col("d_a") + col("c_a")).over(wAll)
          - coalesce(sum(col("d_a") + col("c_a")).over(wPrev), lit(0L)))
        .withColumn("n_b", sum(col("d_b") + col("c_b")).over(wAll)
          - coalesce(sum(col("d_b") + col("c_b")).over(wPrev), lit(0L)))
        .withColumn("e_a_micro", expr(
          """cast(case when n_a + n_b > 0
               then (1000000 * cast(d_a + d_b as decimal(38,0)) * n_a)
                 div (n_a + n_b)
               else 0L end as bigint)"""))
        .withColumn("oe_micro", expr("1000000 * d_a - e_a_micro"))
        .withColumn("var_micro", expr(
          """case when n_a + n_b > 1 then
               (cast(d_a + d_b as decimal(38,0))
                 * ((1000000 * n_a) div (n_a + n_b))
                 * ((1000000 * n_b) div (n_a + n_b))
                 * (n_a + n_b - d_a - d_b))
               div (cast(1000000 as decimal(38,0)) * (n_a + n_b - 1))
             else 0L end"""))
        .withColumn("cum_oe_micro", sum(col("oe_micro")).over(wCum))
        .withColumn("cum_var_micro", sum(col("var_micro")).over(wCum))
        .withColumn("lr_chi2_micro", expr(
          """cast(case when cum_var_micro > 0
               then (cast(cum_oe_micro as decimal(38,0)) * cum_oe_micro)
                 div cum_var_micro end as bigint)"""))
        .select(col("t"), col("n_a"), col("n_b"), col("d_a"), col("d_b"),
          col("e_a_micro"), col("oe_micro"), col("var_micro"),
          col("cum_oe_micro"), col("cum_var_micro"), col("lr_chi2_micro"))
        .orderBy("t")
    },
    Some("""WITH pu AS (
              SELECT user_id,
                MIN(CASE WHEN event_type = 'view'
                  THEN CAST(date_trunc('day', ts) AS DATE) END) AS fv,
                MIN(CASE WHEN event_type = 'purchase'
                  THEN CAST(date_trunc('day', ts) AS DATE) END) AS fp
              FROM events WHERE event_type IN ('view', 'purchase')
              GROUP BY 1),
            h AS (SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS hmax
                  FROM events),
            dur AS (
              SELECT CASE WHEN fp IS NOT NULL AND fp >= fv
                  THEN datediff('day', fv, fp)
                  ELSE datediff('day', fv, hmax) END AS t,
                (fp IS NOT NULL AND fp >= fv) AS conv,
                CAST(CAST(CONCAT('0x', substr(md5('a:' ||
                  CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
                  % 2 AS arm
              FROM pu, h WHERE fv IS NOT NULL),
            byday AS (
              SELECT CAST(t AS BIGINT) AS t,
                CAST(SUM(CASE WHEN conv AND arm = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d_a,
                CAST(SUM(CASE WHEN conv AND arm = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d_b,
                CAST(SUM(CASE WHEN NOT conv AND arm = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_a,
                CAST(SUM(CASE WHEN NOT conv AND arm = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_b
              FROM dur GROUP BY 1),
            risk AS (
              SELECT t, d_a, d_b,
                CAST(SUM(d_a + c_a) OVER ()
                  - COALESCE(SUM(d_a + c_a) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_a,
                CAST(SUM(d_b + c_b) OVER ()
                  - COALESCE(SUM(d_b + c_b) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_b
              FROM byday),
            terms AS (
              SELECT t, n_a, n_b, d_a, d_b,
                CASE WHEN n_a + n_b > 0
                  THEN (1000000 * CAST(d_a + d_b AS HUGEINT) * n_a)
                    // (n_a + n_b)
                  ELSE 0 END AS e_a_micro,
                1000000 * d_a - CASE WHEN n_a + n_b > 0
                  THEN (1000000 * CAST(d_a + d_b AS HUGEINT) * n_a)
                    // (n_a + n_b)
                  ELSE 0 END AS oe_micro,
                CASE WHEN n_a + n_b > 1 THEN
                  (CAST(d_a + d_b AS HUGEINT)
                    * ((1000000 * n_a) // (n_a + n_b))
                    * ((1000000 * n_b) // (n_a + n_b))
                    * (n_a + n_b - d_a - d_b))
                  // (CAST(1000000 AS HUGEINT) * (n_a + n_b - 1))
                ELSE 0 END AS var_micro
              FROM risk),
            cum AS (
              SELECT t, n_a, n_b, d_a, d_b,
                CAST(e_a_micro AS BIGINT) AS e_a_micro,
                CAST(oe_micro AS BIGINT) AS oe_micro,
                CAST(var_micro AS BIGINT) AS var_micro,
                SUM(CAST(oe_micro AS HUGEINT)) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_oe,
                SUM(CAST(var_micro AS HUGEINT)) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_var
              FROM terms)
            SELECT t, n_a, n_b, d_a, d_b, e_a_micro, oe_micro, var_micro,
              CAST(cum_oe AS BIGINT) AS cum_oe_micro,
              CAST(cum_var AS BIGINT) AS cum_var_micro,
              CAST(CASE WHEN cum_var > 0 THEN (cum_oe * cum_oe) // cum_var END
                AS BIGINT) AS lr_chi2_micro
            FROM cum ORDER BY t"""))

  /** Shared period split for the pre/post experiment rows (x379/x381):
    * day < dmin + ⌊span/2⌋ is period 1, else period 2, where span is
    * the INCLUSIVE day count datediff(dmax,dmin)+1 — a deterministic
    * closed form over the fixture's own timeline, so both engines and
    * every consumer cut at the same day. (The floor form is what every
    * consumer computes — `(datediff+1) div 2`; the r12 scaladoc said
    * ceil, which differs for odd spans. r13 ADVICE doc fix.)
    */
  private def periodBounds(s: SparkSession, dir: String): DataFrame =
    events(s, dir).agg(
      min(date_trunc("day", col("ts")).cast("date")).as("dmin"),
      max(date_trunc("day", col("ts")).cast("date")).as("dmax"))

  // ------------------------------------------------------------------- x379
  // Difference-in-differences (Ashenfelter & Card 1985) — the quasi-
  // experimental estimator a platform reaches for when the rollout was
  // NOT randomized-per-exposure but phased in time: mean events/user by
  // (arm × half-of-timeline) cell, DiD = (B₂−B₁) − (A₂−A₁), exactly the
  // parallel-trends readout. Milli-quantized integer means (one
  // integer division per cell); the 2×2 pivots to a single row so the
  // estimate reads left-to-right.
  //
  // Scale shape: ONE conditional aggregate over the event scan (cells
  // are a 4-value domain), then a 1-row pivot. Nothing per-user
  // materializes except COUNT(DISTINCT user_id) per cell — an exact
  // distinct over a 4-cell grid, the same shuffle c15 pays.
  private val x379 = GQuery(
    "x379_did_estimator", "ext-events experiment diff-in-diff",
    (s, dir) => {
      val cells = events(s, dir).crossJoin(broadcast(periodBounds(s, dir)))
        .select(col("user_id"), Experiment.arm.as("arm"),
          when(date_trunc("day", col("ts")).cast("date") <
            expr("date_add(dmin, cast((datediff(dmax, dmin) + 1) div 2 as int))"),
            1L).otherwise(2L).as("period"))
        .groupBy(col("arm"), col("period"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .withColumn("mean_milli", expr("(1000 * n_events) div n_users"))
      cells.agg(
        max(when(col("arm") === 0L && col("period") === 1L, col("n_users"))).as("n_a1"),
        max(when(col("arm") === 0L && col("period") === 2L, col("n_users"))).as("n_a2"),
        max(when(col("arm") === 1L && col("period") === 1L, col("n_users"))).as("n_b1"),
        max(when(col("arm") === 1L && col("period") === 2L, col("n_users"))).as("n_b2"),
        max(when(col("arm") === 0L && col("period") === 1L, col("mean_milli"))).as("mean_a1_milli"),
        max(when(col("arm") === 0L && col("period") === 2L, col("mean_milli"))).as("mean_a2_milli"),
        max(when(col("arm") === 1L && col("period") === 1L, col("mean_milli"))).as("mean_b1_milli"),
        max(when(col("arm") === 1L && col("period") === 2L, col("mean_milli"))).as("mean_b2_milli"))
        .withColumn("did_milli", expr(
          "(mean_b2_milli - mean_b1_milli) - (mean_a2_milli - mean_a1_milli)"))
    },
    Some("""WITH b AS (SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS dmin,
                         MAX(CAST(date_trunc('day', ts) AS DATE)) AS dmax
                       FROM events),
            pp AS (SELECT user_id,
                     CAST(CAST(CONCAT('0x', substr(md5('a:' ||
                       CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
                       % 2 AS arm,
                     CASE WHEN CAST(date_trunc('day', ts) AS DATE)
                       < dmin + CAST(((datediff('day', dmin, dmax) + 1) // 2)
                           AS INTEGER)
                       THEN 1 ELSE 2 END AS period
                   FROM events, b),
            cell AS (SELECT arm, period,
                       CAST(COUNT(*) AS BIGINT) AS n_events,
                       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
                     FROM pp GROUP BY 1, 2),
            m AS (SELECT arm, period, n_users,
                    (1000 * n_events) // n_users AS mean_milli FROM cell)
            SELECT
              MAX(CASE WHEN arm=0 AND period=1 THEN n_users END) AS n_a1,
              MAX(CASE WHEN arm=0 AND period=2 THEN n_users END) AS n_a2,
              MAX(CASE WHEN arm=1 AND period=1 THEN n_users END) AS n_b1,
              MAX(CASE WHEN arm=1 AND period=2 THEN n_users END) AS n_b2,
              MAX(CASE WHEN arm=0 AND period=1 THEN mean_milli END) AS mean_a1_milli,
              MAX(CASE WHEN arm=0 AND period=2 THEN mean_milli END) AS mean_a2_milli,
              MAX(CASE WHEN arm=1 AND period=1 THEN mean_milli END) AS mean_b1_milli,
              MAX(CASE WHEN arm=1 AND period=2 THEN mean_milli END) AS mean_b2_milli,
              (MAX(CASE WHEN arm=1 AND period=2 THEN mean_milli END)
               - MAX(CASE WHEN arm=1 AND period=1 THEN mean_milli END))
              - (MAX(CASE WHEN arm=0 AND period=2 THEN mean_milli END)
               - MAX(CASE WHEN arm=0 AND period=1 THEN mean_milli END))
                AS did_milli
            FROM m"""))

  // ------------------------------------------------------------------- x380
  // O'Brien–Fleming group-sequential scan (O'Brien & Fleming 1979) —
  // the peeking-correct way to monitor the x357 SRM continuously: four
  // equal-spaced looks over the timeline, cumulative per-arm user
  // counts at each look, and the OBF boundary that spends almost no α
  // early (χ² bound c·K/k for look k — early looks need ~4× the final
  // evidence). Final boundary z = 2.024 (the published K=4, α=0.05
  // two-sided value), so bound_micro = 2.024²·K/k in EXACT integers
  // (2024² = 4096576). A platform that re-checks SRM daily without
  // this correction alarms spuriously; this row is the correction.
  //
  // Scale shape: one per-user first-day aggregate, a 4-row broadcast
  // domain join, a 4-row rollup — the x331 threshold-curve economy.
  private val x380 = GQuery(
    "x380_obrien_fleming_scan", "ext-events experiment sequential srm",
    (s, dir) => {
      val looks = events(s, dir).sparkSession.range(1)
        .select(explode(expr("array(1L, 2L, 3L, 4L)")).as("look"))
        .crossJoin(broadcast(periodBounds(s, dir)))
        .select(col("look"), expr(
          """date_add(dmin, cast(((datediff(dmax, dmin) + 1) * look) div 4
               as int) - 1)""").as("cut_day"))
      val users = events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(date_trunc("day", col("ts")).cast("date")).as("first_day"))
        .withColumn("arm", Experiment.arm)
      users.crossJoin(broadcast(looks))
        .groupBy(col("look"), col("cut_day"))
        .agg(
          sum(when(col("first_day") <= col("cut_day") && col("arm") === 0L,
            1L).otherwise(0L)).as("n_a"),
          sum(when(col("first_day") <= col("cut_day") && col("arm") === 1L,
            1L).otherwise(0L)).as("n_b"))
        .withColumn("chi2_micro", expr(
          """cast(case when n_a + n_b > 0
               then (1000000 * cast(n_a - n_b as decimal(38,0)) * (n_a - n_b))
                 div (n_a + n_b)
               else 0L end as bigint)"""))
        .withColumn("bound_micro", expr("(4096576 * 4) div look"))
        .withColumn("crossed", col("chi2_micro") >= col("bound_micro"))
        .select(col("look"), col("cut_day"), col("n_a"), col("n_b"),
          col("chi2_micro"), col("bound_micro"), col("crossed"))
        .orderBy("look")
    },
    Some("""WITH b AS (SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS dmin,
                         MAX(CAST(date_trunc('day', ts) AS DATE)) AS dmax
                       FROM events),
            k AS (SELECT CAST(unnest([1, 2, 3, 4]) AS BIGINT) AS look),
            cut AS (SELECT look,
                      dmin + CAST((((datediff('day', dmin, dmax) + 1) * look)
                        // 4 - 1) AS INTEGER) AS cut_day
                    FROM k, b),
            u AS (SELECT user_id,
                    MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day,
                    CAST(CAST(CONCAT('0x', substr(md5('a:' ||
                      CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
                      % 2 AS arm
                  FROM events GROUP BY 1, 3),
            cum AS (SELECT c.look, c.cut_day,
                      CAST(SUM(CASE WHEN u.first_day <= c.cut_day AND u.arm = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                      CAST(SUM(CASE WHEN u.first_day <= c.cut_day AND u.arm = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_b
                    FROM cut c, u GROUP BY 1, 2)
            SELECT look, cut_day, n_a, n_b,
              CAST(CASE WHEN n_a + n_b > 0
                THEN (1000000 * CAST(n_a - n_b AS HUGEINT) * (n_a - n_b))
                  // (n_a + n_b)
                ELSE 0 END AS BIGINT) AS chi2_micro,
              CAST((4096576 * 4) // look AS BIGINT) AS bound_micro,
              CASE WHEN n_a + n_b > 0 THEN
                (1000000 * CAST(n_a - n_b AS HUGEINT) * (n_a - n_b))
                  // (n_a + n_b)
                  >= (4096576 * 4) // look ELSE FALSE END AS crossed
            FROM cum ORDER BY look"""))

  // ------------------------------------------------------------------- x381
  // McNemar's paired test (McNemar 1947) — did the SAME users' purchase
  // behavior change between the two timeline halves? The paired design
  // removes between-user variance entirely: only the discordant pairs
  // (purchased in exactly one half) carry information, χ² = (b−c)²/(b+c)
  // with the continuity-corrected (|b−c|−1)²/(b+c) variant beside it.
  // The within-subject companion to x379's between-cell DiD. Exact
  // integers end to end.
  //
  // Scale shape: one per-user conditional rollup (shuffles on user_id),
  // one global 1-row aggregate.
  private val x381 = GQuery(
    "x381_mcnemar_paired", "ext-events experiment paired mcnemar",
    (s, dir) => {
      val pu = events(s, dir).crossJoin(broadcast(periodBounds(s, dir)))
        .select(col("user_id"), col("event_type"),
          when(date_trunc("day", col("ts")).cast("date") <
            expr("date_add(dmin, cast((datediff(dmax, dmin) + 1) div 2 as int))"),
            1L).otherwise(2L).as("period"))
        .groupBy(col("user_id"))
        .agg(
          max(when(col("period") === 1L, 1L).otherwise(0L)).as("act1"),
          max(when(col("period") === 2L, 1L).otherwise(0L)).as("act2"),
          max(when(col("period") === 1L && col("event_type") === "purchase",
            1L).otherwise(0L)).as("p1"),
          max(when(col("period") === 2L && col("event_type") === "purchase",
            1L).otherwise(0L)).as("p2"))
        .where(col("act1") === 1L && col("act2") === 1L)
      pu.agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("p1") === 1L && col("p2") === 0L, 1L).otherwise(0L)).as("b"),
        sum(when(col("p1") === 0L && col("p2") === 1L, 1L).otherwise(0L)).as("c"))
        .withColumn("chi2_micro", expr(
          """cast(case when b + c > 0
               then (1000000 * cast(b - c as decimal(38,0)) * (b - c))
                 div (b + c)
             end as bigint)"""))
        .withColumn("chi2_cc_micro", expr(
          """cast(case when b + c > 0
               then (1000000 * cast(greatest(abs(b - c) - 1, 0L)
                               as decimal(38,0))
                             * greatest(abs(b - c) - 1, 0L)) div (b + c)
             end as bigint)"""))
    },
    Some("""WITH b AS (SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS dmin,
                         MAX(CAST(date_trunc('day', ts) AS DATE)) AS dmax
                       FROM events),
            pp AS (SELECT user_id, event_type,
                     CASE WHEN CAST(date_trunc('day', ts) AS DATE)
                       < dmin + CAST(((datediff('day', dmin, dmax) + 1) // 2)
                           AS INTEGER)
                       THEN 1 ELSE 2 END AS period
                   FROM events, b),
            pu AS (SELECT user_id,
                     MAX(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS act1,
                     MAX(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS act2,
                     MAX(CASE WHEN period = 1 AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS p1,
                     MAX(CASE WHEN period = 2 AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS p2
                   FROM pp GROUP BY 1),
            pairs AS (SELECT * FROM pu WHERE act1 = 1 AND act2 = 1),
            agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                      CAST(SUM(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS b,
                      CAST(SUM(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS c
                    FROM pairs)
            SELECT n_pairs, b, c,
              CAST(CASE WHEN b + c > 0
                THEN (1000000 * CAST(b - c AS HUGEINT) * (b - c)) // (b + c)
                END AS BIGINT) AS chi2_micro,
              CAST(CASE WHEN b + c > 0
                THEN (1000000 * CAST(GREATEST(ABS(b - c) - 1, 0) AS HUGEINT)
                              * GREATEST(ABS(b - c) - 1, 0)) // (b + c)
                END AS BIGINT) AS chi2_cc_micro
            FROM agg"""))

  // ------------------------------------------------------------------- x382
  // Wilson score interval (Wilson 1927) — the conversion-rate CI every
  // experiment readout should print instead of the Wald interval (which
  // collapses to zero width at p̂ ∈ {0,1} — exactly where this fixture
  // sits): per arm, n, conversions, and the 95 % score bounds. The
  // arithmetic is double-precision IEEE from exact integers — safe
  // cross-engine because the expression tree is written IDENTICALLY in
  // both engines, `sqrt` is correctly-rounded by IEEE 754 (unlike
  // ln/exp, which is why entropy-family rows quantize to integers
  // instead), z² = 1.96² = 3.8416 is exact in the literal, and the
  // result quantizes ONCE through floor(1e6·x) (the x228 discipline).
  //
  // Scale shape: one per-user rollup, one 2-row arm aggregate.
  private val x382 = GQuery(
    "x382_conversion_ci_wilson", "ext-events experiment wilson interval",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
        .withColumn("arm", Experiment.arm)
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
        .select(col("arm"), col("n").as("n_users"), col("x").as("n_conv"),
          expr("(1000 * x) div n").as("p_milli"),
          expr("""cast(floor(1000000 * (((cast(x as double) / n)
               + 3.8416 / (2 * n)
               - 1.96 * sqrt(((cast(x as double) / n)
                   * (1 - cast(x as double) / n) + 3.8416 / (4 * n)) / n))
             / (1 + 3.8416 / n))) as bigint)""").as("wilson_lo_micro"),
          expr("""cast(floor(1000000 * (((cast(x as double) / n)
               + 3.8416 / (2 * n)
               + 1.96 * sqrt(((cast(x as double) / n)
                   * (1 - cast(x as double) / n) + 3.8416 / (4 * n)) / n))
             / (1 + 3.8416 / n))) as bigint)""").as("wilson_hi_micro"))
        .orderBy("arm"),
    Some("""WITH u AS (SELECT user_id,
                     CAST(CAST(CONCAT('0x', substr(md5('a:' ||
                       CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
                       % 2 AS arm,
                     MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv
                   FROM events GROUP BY 1, 2),
            a AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(conv) AS BIGINT) AS x FROM u GROUP BY 1)
            SELECT arm, n AS n_users, x AS n_conv, (1000 * x) // n AS p_milli,
              CAST(floor(1000000 * (((CAST(x AS DOUBLE) / n)
                   + 3.8416 / (2 * n)
                   - 1.96 * sqrt(((CAST(x AS DOUBLE) / n)
                       * (1 - CAST(x AS DOUBLE) / n) + 3.8416 / (4 * n)) / n))
                 / (1 + 3.8416 / n))) AS BIGINT) AS wilson_lo_micro,
              CAST(floor(1000000 * (((CAST(x AS DOUBLE) / n)
                   + 3.8416 / (2 * n)
                   + 1.96 * sqrt(((CAST(x AS DOUBLE) / n)
                       * (1 - CAST(x AS DOUBLE) / n) + 3.8416 / (4 * n)) / n))
                 / (1 + 3.8416 / n))) AS BIGINT) AS wilson_hi_micro
            FROM a ORDER BY arm"""))

  // ------------------------------------------------------------------- x383
  // Backfill plan for a quarantined ingest window — the ops table a
  // pipeline owner reads after a bad deploy corrupted a week of ingest
  // (here the deterministic window [dmax−13, dmax−7]): per affected
  // event-day partition, rows and users to recompute, how many
  // hour-grain rollup partitions downstream MVs must rebuild, the
  // day's share of total corpus, and cumulative recompute volume in
  // day order (the progress axis a backfill driver reports against).
  //
  // Scale shape: one day-grain rollup with two exact distincts, then
  // day-DOMAIN windows; the total is a separate 1-row broadcast. The
  // window bound here is DATA-derived (dmax rides the broadcast), so
  // the filter evaluates post-scan in this fixture; in production the
  // quarantine window is a LITERAL date range and day-partitioned
  // storage prunes to exactly the affected files before any read.
  private val x383 = GQuery(
    "x383_backfill_plan", "ext-events ops backfill planning",
    (s, dir) => {
      val wCum = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      val total = events(s, dir).agg(count(lit(1)).as("n_total"))
      events(s, dir).crossJoin(broadcast(periodBounds(s, dir)))
        .where(date_trunc("day", col("ts")).cast("date")
          .between(date_sub(col("dmax"), 13), date_sub(col("dmax"), 7)))
        .select(date_trunc("day", col("ts")).cast("date").as("day"),
          date_trunc("hour", col("ts")).as("hr"), col("user_id"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("hr")).as("n_hour_partitions"))
        .crossJoin(broadcast(total))
        .withColumn("events_share_milli", expr("(1000 * n_events) div n_total"))
        .withColumn("cum_events", sum(col("n_events")).over(wCum))
        .select(col("day"), col("n_events"), col("n_users"),
          col("n_hour_partitions"), col("events_share_milli"),
          col("cum_events"))
        .orderBy("day")
    },
    Some("""WITH b AS (SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS dmax
                       FROM events),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM events),
            q AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                    CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr, user_id
                  FROM events, b
                  WHERE CAST(date_trunc('day', ts) AS DATE)
                    BETWEEN dmax - 13 AND dmax - 7),
            d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
                    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                    CAST(COUNT(DISTINCT hr) AS BIGINT) AS n_hour_partitions
                  FROM q GROUP BY 1)
            SELECT day, n_events, n_users, n_hour_partitions,
              (1000 * n_events) // (SELECT n_total FROM tot)
                AS events_share_milli,
              CAST(SUM(n_events) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS cum_events
            FROM d ORDER BY day"""))

  // ------------------------------------------------------------------- x384
  // Funnel attribution-window sensitivity — the x331 threshold-curve
  // discipline applied to the conversion window x49/x338 hard-code:
  // view→purchase conversion at windows of 1/3/7 days from each user's
  // FIRST view, side by side. When the rate still climbs steeply from
  // w=3 to w=7 the funnel is window-bound, not demand-bound — the read
  // that decides the attribution policy before anyone trusts a single
  // conversion number.
  //
  // Scale shape: one per-user (first_view, first_purchase) aggregate
  // feeds every window; the 3-way explode runs on the per-user rows
  // and rolls up to a 3-row domain. No re-scan per window.
  private val x384 = GQuery(
    "x384_funnel_window_curve", "ext-events funnel window sensitivity",
    (s, dir) =>
      events(s, dir)
        .where(col("event_type").isin("view", "purchase"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view",
            date_trunc("day", col("ts")).cast("date"))).as("fv"),
          min(when(col("event_type") === "purchase",
            date_trunc("day", col("ts")).cast("date"))).as("fp"))
        .where(col("fv").isNotNull)
        .select(col("fv"), col("fp"),
          explode(expr("array(1L, 3L, 7L)")).as("w_days"))
        .groupBy(col("w_days"))
        .agg(count(lit(1)).as("n_viewers"),
          sum(when(col("fp").isNotNull && col("fp") >= col("fv") &&
            datediff(col("fp"), col("fv")) < col("w_days"), 1L).otherwise(0L))
            .as("n_conv"))
        .withColumn("conv_milli", expr("(1000 * n_conv) div n_viewers"))
        .orderBy("w_days"),
    Some("""WITH pu AS (
              SELECT user_id,
                MIN(CASE WHEN event_type = 'view'
                  THEN CAST(date_trunc('day', ts) AS DATE) END) AS fv,
                MIN(CASE WHEN event_type = 'purchase'
                  THEN CAST(date_trunc('day', ts) AS DATE) END) AS fp
              FROM events WHERE event_type IN ('view', 'purchase')
              GROUP BY 1),
            w AS (SELECT CAST(unnest([1, 3, 7]) AS BIGINT) AS w_days),
            c AS (SELECT w.w_days,
                    CAST(COUNT(*) AS BIGINT) AS n_viewers,
                    CAST(SUM(CASE WHEN fp IS NOT NULL AND fp >= fv
                      AND datediff('day', fv, fp) < w.w_days
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_conv
                  FROM pu, w WHERE fv IS NOT NULL GROUP BY 1)
            SELECT w_days, n_viewers, n_conv,
              (1000 * n_conv) // n_viewers AS conv_milli
            FROM c ORDER BY w_days"""))

  // ------------------------------------------------------------------- x387
  // Micro-batch trigger-interval advisor — the sizing read BEFORE
  // choosing a Structured Streaming trigger (x351 sizes the STATE side;
  // this sizes the BATCH side): for candidate intervals 1/5/15 min,
  // exact per-batch row-count distribution (non-empty batches, p50/p95
  // by the x278 nearest-rank convention, max, busiest-batch share).
  // A p95 far above p50 says the source is bursty and the small trigger
  // buys latency only at the cost of straggler batches.
  //
  // Scale shape: one scan fans out ×3 (interval literals), two-level
  // aggregate — (interval, bucket) rollup shuffles on the composite
  // key, then interval-DOMAIN windows over bucket-count rows only.
  private val x387 = GQuery(
    "x387_trigger_interval_advisor", "ext-events streaming trigger sizing",
    (s, dir) => {
      val wR = Window.partitionBy("trigger_sec")
        .orderBy(col("n_rows"), col("bucket"))
      val wP = Window.partitionBy("trigger_sec")
      events(s, dir)
        .select(explode(expr("array(60L, 300L, 900L)")).as("trigger_sec"),
          col("ts"))
        .select(col("trigger_sec"),
          expr("unix_micros(ts) div (trigger_sec * 1000000L)").as("bucket"))
        .groupBy(col("trigger_sec"), col("bucket"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("rn", row_number().over(wR).cast("long"))
        .withColumn("nb", count(lit(1)).over(wP).cast("long"))
        .withColumn("tot", sum(col("n_rows")).over(wP))
        .groupBy(col("trigger_sec"))
        .agg(min(col("nb")).as("n_batches"),
          min(when(expr("rn * 100 >= nb * 50"), col("n_rows"))).as("rows_p50"),
          min(when(expr("rn * 100 >= nb * 95"), col("n_rows"))).as("rows_p95"),
          max(col("n_rows")).as("rows_max"),
          min(col("tot")).as("tot"))
        .withColumn("max_share_milli", expr("(1000 * rows_max) div tot"))
        .drop("tot")
        .orderBy("trigger_sec")
    },
    Some("""WITH t AS (SELECT CAST(unnest([60, 300, 900]) AS BIGINT)
                         AS trigger_sec),
            b AS (SELECT t.trigger_sec,
                    epoch_us(ts) // (t.trigger_sec * 1000000) AS bucket,
                    CAST(COUNT(*) AS BIGINT) AS n_rows
                  FROM events, t GROUP BY 1, 2),
            r AS (SELECT trigger_sec, n_rows,
                    CAST(ROW_NUMBER() OVER (PARTITION BY trigger_sec
                      ORDER BY n_rows, bucket) AS BIGINT) AS rn,
                    CAST(COUNT(*) OVER (PARTITION BY trigger_sec) AS BIGINT)
                      AS nb,
                    CAST(SUM(n_rows) OVER (PARTITION BY trigger_sec)
                      AS BIGINT) AS tot
                  FROM b)
            SELECT trigger_sec,
              MIN(nb) AS n_batches,
              CAST(MIN(CASE WHEN rn * 100 >= nb * 50 THEN n_rows END)
                AS BIGINT) AS rows_p50,
              CAST(MIN(CASE WHEN rn * 100 >= nb * 95 THEN n_rows END)
                AS BIGINT) AS rows_p95,
              MAX(n_rows) AS rows_max,
              (1000 * MAX(n_rows)) // MIN(tot) AS max_share_milli
            FROM r GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x389
  // Watermark-delay policy curve — the third leg of the streaming-sizing
  // family (x351 state, x387 batch, this one LOSS): under x192's
  // deterministic ingest-delay model (arrival = ts + (event_id % 3)
  // days), how many events a `withWatermark(delay)` pipeline DROPS vs
  // BUFFERS at candidate delays of 0/1/2/3 days. An event whose ingest
  // lag exceeds the delay arrives behind the watermark (event time ≈
  // stream max at arrival for the zero-lag cohort) and is discarded;
  // lag ≤ delay is kept but held in state — the drop/state trade the
  // delay knob actually turns. The x331 threshold-curve discipline:
  // one lag projection feeds every candidate, 4-row domain.
  private val x389 = GQuery(
    "x389_watermark_delay_curve", "ext-events streaming watermark loss curve",
    (s, dir) => {
      val tot = events(s, dir).agg(count(lit(1)).as("n_events"))
      events(s, dir)
        .select((col("event_id") % 3).as("lag_days"))
        .select(col("lag_days"),
          explode(expr("array(0L, 1L, 2L, 3L)")).as("delay_days"))
        .groupBy(col("delay_days"))
        .agg(
          sum(when(col("lag_days") > col("delay_days"), 1L).otherwise(0L))
            .as("n_dropped"),
          sum(when(col("lag_days") > 0L &&
            col("lag_days") <= col("delay_days"), 1L).otherwise(0L))
            .as("n_late_kept"))
        .crossJoin(broadcast(tot))
        .select(col("delay_days"), col("n_events"), col("n_dropped"),
          expr("(1000 * n_dropped) div n_events").as("drop_milli"),
          col("n_late_kept"),
          expr("(1000 * n_late_kept) div n_events").as("late_kept_milli"))
        .orderBy("delay_days")
    },
    Some("""WITH e AS (SELECT event_id % 3 AS lag_days FROM events),
            d AS (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS delay_days),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e)
            SELECT d.delay_days,
              (SELECT n FROM tot) AS n_events,
              CAST(SUM(CASE WHEN lag_days > d.delay_days THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
              CAST((1000 * SUM(CASE WHEN lag_days > d.delay_days
                THEN 1 ELSE 0 END))
                // (SELECT n FROM tot) AS BIGINT) AS drop_milli,
              CAST(SUM(CASE WHEN lag_days > 0 AND lag_days <= d.delay_days
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late_kept,
              CAST((1000 * SUM(CASE WHEN lag_days > 0
                AND lag_days <= d.delay_days
                THEN 1 ELSE 0 END)) // (SELECT n FROM tot) AS BIGINT)
                AS late_kept_milli
            FROM e, d GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x390
  // SRM daily drilldown — the LOCALIZATION table behind the x357/x367/
  // x380 alarms: once the scan fires, WHEN did the imbalance start? Per
  // active day, the per-arm distinct-user split, its χ² in micros, the
  // day's share of the summed daily χ² (contribution, exact milli) and
  // the nominal single-test flag (3.841459 — significance stays with
  // x367's family-wise scan; this table is for reading, not alarming).
  //
  // Scale shape: one (day, user) distinct-project (the c15 shuffle),
  // day rollup, then day-DOMAIN windows.
  private val x390 = GQuery(
    "x390_srm_daily_drilldown", "ext-events experiment srm localization",
    (s, dir) => {
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      events(s, dir)
        .select(date_trunc("day", col("ts")).cast("date").as("day"),
          col("user_id")).distinct()
        .withColumn("arm", Experiment.arm)
        .groupBy(col("day"))
        .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"))
        .withColumn("chi2_micro", expr(
          """cast(case when n_a + n_b > 0
               then (1000000 * cast(n_a - n_b as decimal(38,0)) * (n_a - n_b))
                 div (n_a + n_b)
               else 0L end as bigint)"""))
        .withColumn("sum_chi2", sum(col("chi2_micro")).over(wAll))
        .withColumn("contrib_milli", expr(
          """case when sum_chi2 > 0
               then (1000 * chi2_micro) div sum_chi2 else 0L end"""))
        .withColumn("nominal_flag", col("chi2_micro") >= 3841459L)
        .select(col("day"), col("n_a"), col("n_b"), col("chi2_micro"),
          col("contrib_milli"), col("nominal_flag"))
        .orderBy("day")
    },
    Some("""WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
                          AS day, user_id
                        FROM events),
            a AS (SELECT day,
                    CAST(SUM(CASE WHEN CAST(CAST(CONCAT('0x',
                      substr(md5('a:' || CAST(user_id AS VARCHAR)), 1, 8))
                      AS UBIGINT) AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_a,
                    CAST(SUM(CASE WHEN CAST(CAST(CONCAT('0x',
                      substr(md5('a:' || CAST(user_id AS VARCHAR)), 1, 8))
                      AS UBIGINT) AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_b
                  FROM du GROUP BY 1),
            c AS (SELECT day, n_a, n_b,
                    CASE WHEN n_a + n_b > 0
                      THEN CAST((1000000 * CAST(n_a - n_b AS HUGEINT)
                        * (n_a - n_b)) // (n_a + n_b) AS BIGINT)
                      ELSE 0 END AS chi2_micro
                  FROM a)
            SELECT day, n_a, n_b, CAST(chi2_micro AS BIGINT) AS chi2_micro,
              CASE WHEN SUM(chi2_micro) OVER () > 0
                THEN CAST((1000 * chi2_micro) // SUM(chi2_micro) OVER ()
                  AS BIGINT)
                ELSE 0 END AS contrib_milli,
              chi2_micro >= 3841459 AS nominal_flag
            FROM c ORDER BY day"""))

  // ------------------------------------------------------------------- x391
  // Novelty-effect curve (Kohavi et al., Trustworthy Online Controlled
  // Experiments ch. 23) — the treatment-effect-by-exposure-age table
  // that separates a REAL effect from a novelty (or primacy) artifact:
  // per days-since-first-exposure k, per-arm mean events/user in exact
  // millis and their delta. An effect that decays toward zero as k
  // grows is novelty, not product value — the read that should gate
  // any x379/x362 readout before shipping.
  //
  // Scale shape: one per-user first-day aggregate joins back to the
  // event scan on user_id (co-partitioned, the x31 shape), then an
  // (arm, k) rollup with an exact per-cell distinct and a k-DOMAIN
  // pivot.
  private val x391 = GQuery(
    "x391_novelty_effect_curve", "ext-events experiment novelty decay",
    (s, dir) => {
      val u = events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(date_trunc("day", col("ts")).cast("date")).as("first_day"))
        .withColumn("arm", Experiment.arm)
      events(s, dir).join(u, Seq("user_id"))
        .select(col("arm"),
          datediff(date_trunc("day", col("ts")).cast("date"),
            col("first_day")).cast("long").as("k"),
          col("user_id"))
        .groupBy(col("arm"), col("k"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .withColumn("mean_milli", expr("(1000 * n_events) div n_users"))
        .groupBy(col("k"))
        .agg(
          max(when(col("arm") === 0L, col("n_users"))).as("n_users_a"),
          max(when(col("arm") === 1L, col("n_users"))).as("n_users_b"),
          max(when(col("arm") === 0L, col("mean_milli"))).as("mean_a_milli"),
          max(when(col("arm") === 1L, col("mean_milli"))).as("mean_b_milli"))
        .where(col("n_users_a").isNotNull && col("n_users_b").isNotNull)
        .withColumn("delta_milli", expr("mean_b_milli - mean_a_milli"))
        .orderBy("k")
    },
    Some("""WITH u AS (SELECT user_id,
                    MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day,
                    CAST(CAST(CONCAT('0x', substr(md5('a:' ||
                      CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
                      % 2 AS arm
                  FROM events GROUP BY 1, 3),
            k AS (SELECT u.arm, datediff('day', u.first_day,
                    CAST(date_trunc('day', e.ts) AS DATE)) AS k,
                    e.user_id
                  FROM events e JOIN u ON u.user_id = e.user_id),
            g AS (SELECT arm, CAST(k AS BIGINT) AS k,
                    CAST(COUNT(*) AS BIGINT) AS n_events,
                    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
                  FROM k GROUP BY 1, 2),
            m AS (SELECT arm, k, n_users,
                    (1000 * n_events) // n_users AS mean_milli
                  FROM g)
            SELECT k,
              MAX(CASE WHEN arm = 0 THEN n_users END) AS n_users_a,
              MAX(CASE WHEN arm = 1 THEN n_users END) AS n_users_b,
              MAX(CASE WHEN arm = 0 THEN mean_milli END) AS mean_a_milli,
              MAX(CASE WHEN arm = 1 THEN mean_milli END) AS mean_b_milli,
              MAX(CASE WHEN arm = 1 THEN mean_milli END)
                - MAX(CASE WHEN arm = 0 THEN mean_milli END) AS delta_milli
            FROM m GROUP BY 1
            HAVING MAX(CASE WHEN arm = 0 THEN n_users END) IS NOT NULL
              AND MAX(CASE WHEN arm = 1 THEN n_users END) IS NOT NULL
            ORDER BY k"""))

  // ------------------------------------------------------------------- x394
  // Winsorization-threshold sensitivity — the x331 curve discipline on
  // the upper-clip percentile x374 hard-codes at 950‰: per p ∈
  // {900, 950, 990}, the exact nearest-rank threshold and the per-arm
  // winsorized means + delta. When the measured effect moves materially
  // across this row, the "result" is a few whales and the clip choice —
  // not the treatment — is driving the readout (the reason winsorized
  // readouts exist at all). Upper clip only: the metric is non-negative
  // spend, where the heavy tail lives.
  //
  // Scale shape: x374's — one per-user rollup, a global rank window
  // (user-grain, the same sort x374 pays), a 3-row threshold broadcast,
  // then (p, arm) domain rollups.
  private val x394 = GQuery(
    "x394_winsor_threshold_curve", "ext-events experiment winsor sensitivity",
    (s, dir) => {
      val per = events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"))
        .withColumn("arm", Experiment.arm)
      val wR = Window.orderBy(col("spend"), col("user_id"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val ranked = per
        .withColumn("rn", row_number().over(wR).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .localCheckpoint(true) // threshold fold + clipped rollup
      val thr = ranked
        .select(col("rn"), col("n"), col("spend"),
          explode(expr("array(900L, 950L, 990L)")).as("p_milli"))
        .groupBy(col("p_milli"))
        .agg(min(when(col("rn") * 1000 >= col("n") * col("p_milli"),
          col("spend"))).as("hi_cents"))
      // equi-join on the threshold key (never a cross join — the 3-row
      // side is an aggregate the plan cannot prove tiny, and the
      // registry's cartesian gate rightly refuses to take our word)
      ranked
        .select(col("spend"), col("arm"),
          explode(expr("array(900L, 950L, 990L)")).as("p_milli"))
        .join(broadcast(thr), Seq("p_milli"))
        .withColumn("w", least(col("spend"), col("hi_cents")))
        .groupBy(col("p_milli"), col("hi_cents"), col("arm"))
        .agg(count(lit(1)).as("n_users"), sum(col("w")).as("sw"))
        .groupBy(col("p_milli"), col("hi_cents"))
        .agg(
          max(when(col("arm") === 0L, col("n_users"))).as("n_a"),
          max(when(col("arm") === 1L, col("n_users"))).as("n_b"),
          max(when(col("arm") === 0L,
            expr("(1000000 * sw) div n_users"))).as("mean_a_winsor_micro"),
          max(when(col("arm") === 1L,
            expr("(1000000 * sw) div n_users"))).as("mean_b_winsor_micro"))
        .withColumn("delta_micro",
          expr("mean_b_winsor_micro - mean_a_winsor_micro"))
        .orderBy("p_milli")
    },
    Some("""WITH per AS (
              SELECT user_id,
                CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                  AS spend,
                CAST(CAST(CONCAT('0x', substr(md5('a:' ||
                  CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
                  % 2 AS arm
              FROM events GROUP BY 1),
            rk AS (SELECT *,
                     CAST(ROW_NUMBER() OVER (ORDER BY spend, user_id)
                       AS BIGINT) AS rn,
                     CAST(COUNT(*) OVER () AS BIGINT) AS n
                   FROM per),
            p AS (SELECT CAST(unnest([900, 950, 990]) AS BIGINT) AS p_milli),
            thr AS (SELECT p.p_milli,
                      MIN(CASE WHEN rn * 1000 >= n * p.p_milli
                        THEN spend END) AS hi_cents
                    FROM rk, p GROUP BY 1),
            cl AS (SELECT t.p_milli, t.hi_cents, r.arm,
                     LEAST(r.spend, t.hi_cents) AS w
                   FROM rk r, thr t),
            g AS (SELECT p_milli, hi_cents, arm,
                    CAST(COUNT(*) AS BIGINT) AS n_users,
                    CAST(SUM(w) AS BIGINT) AS sw
                  FROM cl GROUP BY 1, 2, 3)
            SELECT p_milli, CAST(hi_cents AS BIGINT) AS hi_cents,
              MAX(CASE WHEN arm = 0 THEN n_users END) AS n_a,
              MAX(CASE WHEN arm = 1 THEN n_users END) AS n_b,
              CAST(MAX(CASE WHEN arm = 0 THEN (1000000 * sw) // n_users END)
                AS BIGINT) AS mean_a_winsor_micro,
              CAST(MAX(CASE WHEN arm = 1 THEN (1000000 * sw) // n_users END)
                AS BIGINT) AS mean_b_winsor_micro,
              CAST(MAX(CASE WHEN arm = 1 THEN (1000000 * sw) // n_users END)
                - MAX(CASE WHEN arm = 0 THEN (1000000 * sw) // n_users END)
                AS BIGINT) AS delta_micro
            FROM g GROUP BY 1, 2 ORDER BY 1"""))

  // ------------------------------------------------------------------- x395
  // Benjamini–Hochberg FDR scan (Benjamini & Hochberg 1995) — the
  // step-UP companion completing the multiple-testing family (x357
  // single test, x367 Holm step-down FWER, x380 sequential): over the
  // SAME srmArmCounts substrate, accept every rank up to the LARGEST k
  // whose χ² clears the α·k/m critical. The per-rank critical comes
  // from the x367 micro-integer ladder, DISCRETIZED CONSERVATIVELY:
  // p* = α·k/m rounds DOWN to the nearest tabulated ladder p (the
  // rung with 50000//j ≤ p*_ppm), so the crit used is ≥ the exact BH
  // crit — rejections are a subset of true BH, never a superset
  // (ladder-discretized BH; exact inverse-χ² at arbitrary p is not
  // cross-engine reproducible, ladder lookups are). Ranks whose p*
  // falls BELOW the strictest rung (no j with α/j ≤ p*, i.e. m > 10·k)
  // ABSTAIN — crit NULL, cannot certify kmax — since handing them the
  // α/10 rung would be looser than exact BH and break the subset claim
  // (r13, replacing the r12 coalesce-to-rung-10; unreachable at the
  // m≤10 fixture, same class as x367's m>10 fix). BH rejection set ⊇
  // Holm's by construction — pinned in spec.
  //
  // Scale shape: x367's — one distinct-project + type rollup, then
  // |types|-domain window arithmetic.
  private val x395 = GQuery(
    "x395_bh_fdr_scan", "ext-events experiment bh fdr step-up",
    (s, dir) => {
      val wR = Window.orderBy(col("chi2_micro").desc, col("event_type"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      srmArmCounts(s, dir)
        .withColumn("chi2_micro", expr(
          """cast((1000000 * cast(n_a - n_b as decimal(38,0)) * (n_a - n_b))
               div (n_a + n_b) as bigint)"""))
        .withColumn("rank", row_number().over(wR).cast("long"))
        .withColumn("m", count(lit(1)).over(wAll).cast("long"))
        .withColumn("pstar_ppm", expr("(50000 * rank) div m"))
        .withColumn("rung", expr(
          "array_min(filter(sequence(1, 10), j -> 50000 div j <= pstar_ppm))"))
        .withColumn("crit_micro", expr(
          """case when rung is not null then
               element_at(array(3841459L, 5023886L, 5731139L, 6238533L,
                 6634897L, 6960401L, 7236689L, 7476773L, 7689093L,
                 7879439L),
               cast(rung as int)) end"""))
        .withColumn("passing_rank",
          when(col("crit_micro").isNotNull &&
            col("chi2_micro") >= col("crit_micro"), col("rank")))
        .withColumn("kmax",
          coalesce(max(col("passing_rank")).over(wAll), lit(0L)))
        .withColumn("bh_reject", col("rank") <= col("kmax"))
        .select(col("event_type"), col("n_a"), col("n_b"), col("chi2_micro"),
          col("rank"), col("pstar_ppm"), col("crit_micro"), col("bh_reject"))
        .orderBy("rank")
    },
    Some("""WITH u AS (
              SELECT DISTINCT event_type, user_id FROM events),
            a AS (
              SELECT event_type,
                CAST(CAST(CONCAT('0x', substr(md5('a:' ||
                  CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
                  % 2 AS arm
              FROM u),
            g AS (
              SELECT event_type,
                CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_a,
                CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_b
              FROM a GROUP BY 1),
            c AS (
              SELECT event_type, n_a, n_b,
                CAST((1000000 * CAST(n_a - n_b AS HUGEINT) * (n_a - n_b))
                  // (n_a + n_b) AS BIGINT) AS chi2_micro
              FROM g),
            r AS (
              SELECT *,
                CAST(ROW_NUMBER() OVER (ORDER BY chi2_micro DESC, event_type)
                  AS BIGINT) AS rank,
                CAST(COUNT(*) OVER () AS BIGINT) AS m
              FROM c),
            k AS (
              SELECT *, (50000 * rank) // m AS pstar_ppm,
                list_min(list_filter([1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
                  j -> 50000 // j <= (50000 * rank) // m)) AS rung
              FROM r),
            s AS (
              SELECT *,
                CASE WHEN rung IS NOT NULL THEN
                  ([3841459, 5023886, 5731139, 6238533, 6634897, 6960401,
                    7236689, 7476773, 7689093, 7879439])[rung]
                END AS crit_micro,
                CASE WHEN rung IS NOT NULL AND chi2_micro >=
                  ([3841459, 5023886, 5731139, 6238533, 6634897, 6960401,
                    7236689, 7476773, 7689093, 7879439])[rung]
                  THEN rank ELSE NULL END AS passing_rank
              FROM k),
            mx AS (SELECT MAX(passing_rank) AS kmax FROM s)
            SELECT event_type, n_a, n_b, chi2_micro, rank,
              CAST(pstar_ppm AS BIGINT) AS pstar_ppm,
              CAST(crit_micro AS BIGINT) AS crit_micro,
              rank <= COALESCE((SELECT kmax FROM mx), 0) AS bh_reject
            FROM s ORDER BY rank"""))

  val queries: Seq[GQuery] = Seq(x49, c38, x103, x106, x107, x308, x310,
    x321, x322, x323, x331, x338, x342, x351, x353, x357, x359,
    x361, x362, x367, x368, x369, x373, x374, x375,
    x378, x379, x380, x381, x382, x383, x384, x387, x389, x390, x391,
    x394, x395,
    x114, x115, x116, x117, x118, x125, x134, x135, x137, x149, x150, x151,
    x152, x153, x156, x161, x162, x163, x164, x165, x166, x167, x169,
    x171, x172, x186, x187, x192, x193, x194, x197, x198, x200, x201, x203,
    x206, x208, x211, x213, x214, x218, x228, x249, x250, x252, x262,
    x268, x269, x270, x285, x287, x288, x289, x296, x297, x299)
}
