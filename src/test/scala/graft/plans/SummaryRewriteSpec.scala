package graft.plans

import graft.{SparkSpec, Tables}
import graft.queries.Lakehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Materialized-view rewrite gates: (a) rewritten plans really scan the
  * summary and not the fact table, (b) results are bit-identical to the
  * un-rewritten plan for every supported shape including coarser rollups
  * and event_type filters, (c) out-of-scope queries are provably left
  * untouched.
  */
class SummaryRewriteSpec extends SparkSpec {

  private lazy val mvPath: String = Lakehouse.ensureMv(spark, sf001)

  private def planString(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  /** Root paths of every file scan in the optimized plan (the printed plan
    * elides paths, so the pin inspects the relations structurally).
    */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      case _ => Nil
    }

  private def scansSummary(df: DataFrame): Boolean = {
    val ps = scanPaths(df)
    ps.nonEmpty && ps.forall(_.contains("mv_events_daily_v1"))
  }

  private def scansFactOnly(df: DataFrame): Boolean = {
    val ps = scanPaths(df)
    ps.nonEmpty && ps.forall(p =>
      p.endsWith("events.parquet") && !p.contains("mv_events_daily_v1"))
  }

  private def withRuleOff[A](body: => A): A = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_.isInstanceOf[SummaryRewrite])
    try body finally spark.experimental.extraOptimizations = saved
  }

  private def assertSameRows(df: => DataFrame): Unit = {
    val on = df.collect().toSeq
    val off = withRuleOff(df.collect().toSeq)
    assert(on == off, "rewrite changed results")
  }

  private def events: DataFrame = Tables(spark, sf001, "events")
  private def moneySum = sum(col("value").cast(DecimalType(18, 2)))

  test("day x type rollup is served from the summary, bit-identically") {
    mvPath // force install
    val q = Lakehouse.dailyRollup(events)
    assert(scansSummary(q), planString(q))
    assertSameRows(Lakehouse.dailyRollup(events))
  }

  test("coarser grains reuse the same summary: day-only, type-only, global") {
    mvPath
    val byDay = events.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), moneySum.cast("double").as("s"))
      .orderBy("day")
    val byType = events.groupBy(col("event_type"))
      .agg(max(col("value")).as("mx"), min(col("value")).as("mn"))
      .orderBy("event_type")
    val global = events.agg(count(lit(1)).as("n"), moneySum.cast("double").as("s"))
    for (q <- Seq(byDay, byType, global)) assert(scansSummary(q), planString(q))
    assertSameRows(events.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), moneySum.cast("double").as("s")).orderBy("day"))
    assertSameRows(events.groupBy(col("event_type"))
      .agg(max(col("value")).as("mx"), min(col("value")).as("mn"))
      .orderBy("event_type"))
    assertSameRows(events.agg(count(lit(1)).as("n"), moneySum.cast("double").as("s")))
  }

  test("event_type filters map onto the summary") {
    mvPath
    val q = events.where(col("event_type").isin("view", "click"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy("event_type")
    assert(scansSummary(q), planString(q))
    assertSameRows(events.where(col("event_type").isin("view", "click"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n")).orderBy("event_type"))
  }

  test("out-of-scope shapes keep the fact scan") {
    mvPath
    // finer grain
    val hourly = events.groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    // non-mapped grouping column
    val byUser = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    // unsupported aggregate (order-dependent double sum)
    val rawSum = events.groupBy(col("event_type")).agg(sum(col("value")).as("s"))
    // unsupported filter column
    val valFilter = events.where(col("value") > 10)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    // count over a nullable-semantics column (not count(1))
    val countCol = events.groupBy(col("event_type"))
      .agg(count(col("user_id")).as("n"))
    for (q <- Seq(hourly, byUser, rawSum, valFilter, countCol))
      assert(scansFactOnly(q), planString(q))
  }

  test("a different scale factor's events table does not match this summary") {
    mvPath // installed for sf001
    val other = Tables(spark, "/root/testdata/sf0.01", "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    assert(scansFactOnly(other), planString(other))
  }

  test("two facts serve concurrently from their own summaries; same-fact reinstall replaces") {
    mvPath // sf001 rule
    Lakehouse.ensureMv(spark, "/root/testdata/sf0.01") // second fact's rule
    try {
      val q1 = events.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val q2 = Tables(spark, "/root/testdata/sf0.01", "events")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      assert(scansSummary(q1) && scansSummary(q2))
      // each routed to its OWN summary (different artifact dirs)
      assert(scanPaths(q1) != scanPaths(q2))
      // reinstalling the sf001 rule replaces it, not stacks it (count is
      // order-independent: other suites may have rules for other facts
      // installed — e.g. x155's lineitem summary via the registry spec)
      val before = spark.experimental.extraOptimizations
        .count(_.isInstanceOf[SummaryRewrite])
      Lakehouse.ensureMv(spark, sf001)
      val after = spark.experimental.extraOptimizations
        .count(_.isInstanceOf[SummaryRewrite])
      assert(after == before, s"reinstall stacked a rule: $before -> $after")
    } finally {
      // leave only the sf001 rule behind for the other tests
      SummaryRewrite.uninstall(spark)
      Lakehouse.ensureMv(spark, sf001)
    }
  }

  test("rollup/cube/grouping-sets lattices are served from the summary") {
    mvPath
    def rollup = events
      .rollup(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum.cast("double").as("s"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
      .orderBy(col("day"), col("event_type"))
    def cube = events
      .cube(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("day"), col("event_type"))
    assert(scansSummary(rollup), planString(rollup))
    assert(scansSummary(cube), planString(cube))
    assertSameRows(rollup)
    assertSameRows(cube)

    Tables.views(spark, sf001, Seq("events"))
    def gsets = spark.sql(
      """SELECT date_trunc('day', ts) AS day, event_type, COUNT(1) AS n
         FROM events
         GROUP BY GROUPING SETS ((date_trunc('day', ts)), (event_type), ())
         ORDER BY day, event_type""")
    assert(scansSummary(gsets), planString(gsets))
    assertSameRows(gsets)
  }

  test("generic columns: lineitem revenue rollup served from its own summary") {
    mvPath
    Lakehouse.ensureMvFor(spark, sf001, "lineitem",
      "l_shipdate", "l_returnflag", "l_extendedprice")
    try {
      def q = Tables(spark, sf001, "lineitem")
        .groupBy(date_trunc("day", col("l_shipdate")).as("day"),
          col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double")
            .as("revenue"))
        .orderBy("day", "l_returnflag")
      val ps = scanPaths(q)
      assert(ps.nonEmpty && ps.forall(_.contains("mv_lineitem_l_shipdate_daily_v1")), ps)
      assertSameRows(q)
      // the events rule is still installed and still serves its own fact
      val ev = events.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      assert(scansSummary(ev), planString(ev))
    } finally {
      // restore the single-events-rule state the remaining tests expect
      SummaryRewrite.uninstall(spark)
      Lakehouse.ensureMv(spark, sf001)
    }
  }

  test("day-aligned ts ranges map onto the summary; misaligned ones do not") {
    mvPath
    import java.sql.Timestamp
    val lo = lit(Timestamp.valueOf("2024-01-03 00:00:00"))
    val hi = lit(Timestamp.valueOf("2024-01-10 00:00:00"))
    def ranged = events.where(col("ts") >= lo && col("ts") < hi)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"),
        moneySum.cast("double").as("s"))
      .orderBy("event_type")
    assert(scansSummary(ranged), planString(ranged))
    assertSameRows(ranged)

    // misaligned bound (10:30) — floor equivalence fails, fact scan stays
    val mis = events.where(col("ts") >= lit(Timestamp.valueOf("2024-01-03 10:30:00")))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    assert(scansFactOnly(mis), planString(mis))
    // strict > on a boundary is not floor-equivalent either
    val strict = events.where(col("ts") > lo)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    assert(scansFactOnly(strict), planString(strict))
  }

  test("a finer-grain rollup keeps the fact scan") {
    mvPath
    val hourly = events
      .rollup(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(scansFactOnly(hourly), planString(hourly))
  }

  test("rewrite survives composition: ratio-of-aggregates and sql path") {
    mvPath
    Tables.views(spark, sf001, Seq("events"))
    val q = spark.sql(
      """SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1) AS avg_v
         FROM events GROUP BY event_type ORDER BY event_type""")
    assert(scansSummary(q), planString(q))
    val on = q.collect().toSeq
    val off = withRuleOff(spark.sql(
      """SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1) AS avg_v
         FROM events GROUP BY event_type ORDER BY event_type""").collect().toSeq)
    assert(on == off)
  }
}
