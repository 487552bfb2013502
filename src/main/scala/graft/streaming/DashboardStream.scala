package graft.streaming

import graft.StoredManifest
import graft.pipeline.{GraftConfig, RunAnalytics, RunStatus}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.TimestampType

/** Streaming refresh of the five Grafana dashboard panels — the monitoring
  * loop the reference closes OUTSIDE the engine (Grafana polls Postgres on
  * a 5-minute `refresh` cadence,
  * `/root/reference/grafana/provisioning/dashboards/msconvert.json:6-7`),
  * here closed INSIDE it: a Structured Streaming query watches the
  * pipeline's append-only `history` table and re-publishes every panel as
  * a parquet "materialized view" whenever a cycle lands new rows.
  *
  * Publication is crash-safe via [[graft.StoredManifest]]: each refresh
  * writes ALL panels under a fresh `gen_<batchId>` directory, then flips
  * the manifest pointer once — a dashboard reader (the Grafana stand-in)
  * never sees a half-written refresh, and the PREVIOUS generation stays on
  * disk until the NEXT refresh's sweep so an in-flight read across the
  * flip still completes.
  *
  * Shape notes for scale: the stream source is only the REFRESH SIGNAL —
  * micro-batch rows are not aggregated incrementally; the foreachBatch
  * body recomputes the panels over the full history table, which is
  * run-METADATA (one row per conversion), not data — at 1024 runs/cycle
  * (the reference's MAX_MAP) a year of history is a few million rows, a
  * single-task scan. Incrementalizing the two windowed panels
  * (converted_24h, per_hour) with watermarked streaming aggregation is
  * possible but buys nothing at metadata cardinality and loses the
  * whole-history panels (avg, details), which need the table anyway.
  * Production trigger: `Trigger.ProcessingTime("5 minutes")` — the
  * reference's Grafana cadence; specs use `Trigger.AvailableNow`.
  */
object DashboardStream {

  private def dashDir(cfg: GraftConfig) = s"${cfg.stateDir}/dashboard"

  /** Start the refresh stream over the history table. */
  def start(spark: SparkSession, cfg: GraftConfig,
      trigger: Trigger = Trigger.ProcessingTime("5 minutes")): StreamingQuery = {
    val schema = Encoders.product[RunStatus].schema.add("cycleTs", TimestampType)
    spark.readStream
      .schema(schema)
      .parquet(s"${cfg.stateDir}/history")
      .writeStream
      .queryName("dashboard-refresh")
      .option("checkpointLocation", s"${cfg.stateDir}/dashboard_ckpt")
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        // the batch rows are the signal; the panels recompute over the
        // full (metadata-sized) history — see scaladoc
        refresh(spark, cfg, batchId)
      }
      .start()
  }

  /** One refresh: sweep unreachable generations, write all panels under a
    * new one, flip the manifest. Also callable synchronously (a cycle-end
    * hook) — the streaming form exists so refresh latency is bounded by
    * the trigger, not by the caller remembering to refresh.
    */
  def refresh(spark: SparkSession, cfg: GraftConfig, gen: Long): Unit = {
    val dir = dashDir(cfg)
    val genName = s"gen_$gen"
    // foreachBatch is at-least-once: a crash between the manifest flip and
    // the checkpoint commit re-delivers the SAME batchId, and rewriting
    // the now-live generation in place would un-publish it mid-overwrite.
    // An already-live generation means this refresh already succeeded.
    if (StoredManifest.exists(dir) && StoredManifest.read(dir)._1 == genName)
      return
    StoredManifest.sweepUnreachable(dir)
    val panels = RunAnalytics.dashboard(spark, cfg)
    panels.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$genName/$name")
    }
    StoredManifest.write(dir, genName, panels.keys.toSeq.sorted)
  }

  def published(cfg: GraftConfig): Boolean = StoredManifest.exists(dashDir(cfg))

  /** Read one published panel through the manifest — always a complete
    * refresh generation, never a mid-write mixture.
    */
  def readPanel(spark: SparkSession, cfg: GraftConfig, panel: String): DataFrame = {
    val dir = dashDir(cfg)
    val (gen, segments) = StoredManifest.read(dir)
    require(segments.contains(panel),
      s"unknown panel '$panel'; published: ${segments.mkString(", ")}")
    spark.read.parquet(s"$dir/$gen/$panel")
  }

  /** The live refresh generation (for staleness checks / tests). */
  def liveGeneration(cfg: GraftConfig): String = StoredManifest.read(dashDir(cfg))._1
}
