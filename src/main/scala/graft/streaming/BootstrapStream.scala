package graft.streaming

import graft.StoredManifest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming Poisson-bootstrap mean + confidence band (the x260 estimator
  * maintained INCREMENTALLY as data lands) — the Chamandy et al. 2012
  * method is built for streams precisely because its state is mergeable:
  * each replicate's (Σw·x, Σw) pair is a pair of integer sums, so a
  * landed micro-batch contributes a 32-row DELTA that merges with the
  * stored accumulators by addition. Unlike the drift/dashboard monitors
  * — which RECOMPUTE because their windowed/stacked aggregations don't
  * compose incrementally — this maintainer never re-reads history: per
  * batch it scans ONLY the new rows (the x227/x84 incremental
  * discipline applied to uncertainty estimation).
  *
  * Determinism: weights are the same md5-hex inverse-CDF draws as x260,
  * keyed by (row key, replicate), so the merged state after any arrival
  * order equals the one-shot batch computation over the same rows —
  * BootstrapStreamSpec pins stream ≡ batch exactly, plus replay no-op.
  *
  * Publication: each generation holds `acc` (32 accumulator rows),
  * `tot` (row count + exact sum) and `verdict` (n, exact mean, the
  * 2nd/31st replicate-mean band) — one atomic manifest flip.
  */
object BootstrapStream {

  def monitorDir(stateDir: String): String = s"$stateDir/bootstrap"

  /** Per-row replicate weights + accumulator delta for a (key, cents)
    * frame: 32 rows of (b, swx, sw). The shared kernel of the stream
    * delta and the one-shot batch path.
    */
  def accumulate(rows: DataFrame): DataFrame =
    rows.select(col("key"), col("cents"),
        explode(expr("sequence(1, 32)")).as("b"))
      .withColumn("h",
        substring(md5(concat(col("key"), lit(":"), col("b"))), 1, 4))
      .withColumn("w", expr("""case
           when h < '5e2d' then 0 when h < 'bc5e' then 1
           when h < 'eb79' then 2 when h < 'fb2b' then 3
           when h < 'ff10' then 4 when h < 'ffd9' then 5
           when h < 'fffa' then 6 else 7 end"""))
      .groupBy("b")
      .agg(sum(expr("cast(w * cents as decimal(38,0))")).as("swx"),
        sum(col("w")).as("sw"))

  /** Exact totals for the point estimate: (n_rows, sum_cents). */
  def totals(rows: DataFrame): DataFrame =
    rows.agg(count(lit(1)).as("n_rows"),
      coalesce(sum(col("cents")), lit(0L)).as("sum_cents"))

  /** The published one-row verdict from accumulators + totals. */
  def verdict(acc: DataFrame, tot: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val band = acc.where(col("sw") > 0L)
      .select(col("b"), expr("cast(swx div sw as bigint)").as("mean_b"))
      .withColumn("rn", row_number().over(Window.orderBy("mean_b")))
      .agg(max(when(col("rn") === 2, col("mean_b"))).as("ci_lo_cents"),
        max(when(col("rn") === 31, col("mean_b"))).as("ci_hi_cents"))
    tot.crossJoin(broadcast(band))
      .select(col("n_rows"),
        when(col("n_rows") === 0L, lit(0L))
          .otherwise(expr("sum_cents div n_rows")).as("mean_cents"),
        col("ci_lo_cents"), col("ci_hi_cents"))
  }

  /** Normalize an events-like frame to the (key, cents) kernel input. */
  def asKernelInput(df: DataFrame): DataFrame =
    df.select(col("event_id").as("key"),
      expr("cast(round(value * 100, 0) as bigint)").as("cents"))

  def start(spark: SparkSession, arrivalsDir: String, stateDir: String,
      schema: StructType,
      trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
      pathGlobFilter: String = "*.parquet"): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", pathGlobFilter)
      .parquet(arrivalsDir)
      .writeStream
      .queryName("bootstrap-monitor")
      .option("checkpointLocation", s"$stateDir/bootstrap_ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        update(spark, batch, stateDir, batchId)
      }
      .start()
  }

  /** One incremental update: delta accumulators from THE BATCH ROWS ONLY,
    * merged with the live generation's state by addition, republished
    * under a new generation. Re-delivery of a published batchId is a
    * no-op; a crash before the manifest flip leaves the old generation
    * live and the re-delivered batch re-merges against it.
    */
  def update(spark: SparkSession, batch: DataFrame, stateDir: String,
      gen: Long): Unit = {
    val dir = monitorDir(stateDir)
    val genName = s"gen_$gen"
    if (StoredManifest.exists(dir) && StoredManifest.read(dir)._1 == genName)
      return
    StoredManifest.sweepUnreachable(dir)
    val rows = asKernelInput(batch).localCheckpoint(true)
    val deltaAcc = accumulate(rows)
    val deltaTot = totals(rows)
    val (acc, tot) =
      if (StoredManifest.exists(dir)) {
        val live = StoredManifest.read(dir)._1
        val prevAcc = spark.read.parquet(s"$dir/$live/acc")
        val prevTot = spark.read.parquet(s"$dir/$live/tot")
        (prevAcc.unionAll(deltaAcc).groupBy("b")
          .agg(sum(col("swx")).cast(
            org.apache.spark.sql.types.DecimalType(38, 0)).as("swx"),
            sum(col("sw")).as("sw")),
          prevTot.unionAll(deltaTot)
            .agg(sum(col("n_rows")).as("n_rows"),
              sum(col("sum_cents")).as("sum_cents")))
      } else (deltaAcc, deltaTot)
    val accCk = acc.localCheckpoint(true)
    val totCk = tot.localCheckpoint(true)
    accCk.coalesce(1).write.mode("overwrite").parquet(s"$dir/$genName/acc")
    totCk.coalesce(1).write.mode("overwrite").parquet(s"$dir/$genName/tot")
    verdict(accCk, totCk).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$genName/verdict")
    StoredManifest.write(dir, genName, Seq("acc", "tot", "verdict"))
  }

  def published(stateDir: String): Boolean =
    StoredManifest.exists(monitorDir(stateDir))

  def read(spark: SparkSession, stateDir: String,
      segment: String = "verdict"): DataFrame = {
    val dir = monitorDir(stateDir)
    val (gen, segments) = StoredManifest.read(dir)
    require(segments.contains(segment),
      s"unknown segment '$segment'; published: ${segments.mkString(", ")}")
    spark.read.parquet(s"$dir/$gen/$segment")
  }

  def liveGeneration(stateDir: String): String =
    StoredManifest.read(monitorDir(stateDir))._1
}
