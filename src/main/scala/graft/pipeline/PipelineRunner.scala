package graft.pipeline

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One pipeline cycle — the reference's whole DagRun (SURVEY.md §3.1) as a
  * single Spark job chain:
  *
  *   discover → dedup(anti-join ledger) → quiescence gate → naming →
  *   external-process convert (≤poolSlots) → archive (ALL_DONE) →
  *   ledger updates → run-history append → verify gate
  *
  * Batch mode is the micro-batch body; graft.streaming.PipelinePoller wraps
  * it on the reference's 5-minute trigger. All cross-cycle state (converted
  * ledger, attempts, quiescence clocks, run history) lives in `stateDir`
  * parquet tables — the Spark replacement for the reference's Airflow
  * metadata DB + sentinel files.
  */
object PipelineRunner {

  final case class CycleResult(
      discovered: Long,
      pending: Long,
      ready: Long,
      stats: VerifyGate.BatchStats)

  def runCycle(
      spark: SparkSession,
      cfg: GraftConfig,
      now: Instant = Instant.now()): CycleResult = {
    import spark.implicits._
    val ledger = new LedgerStore(spark, cfg.stateDir, cfg.maxAttempts)

    val discovered = Discovery.discover(spark, cfg).cache()
    val nDiscovered = discovered.count()
    val pending = Discovery.dedup(discovered, ledger, cfg).cache()
    val nPending = pending.count()
    if (nPending == cfg.maxMap)
      log.info(s"cycle capped at MAX_MAP=${cfg.maxMap}; remainder next cycle")

    // A9: observe sizes on executors, advance quiescence clocks vs state table
    val ready = quiesce(spark, pending, cfg, now).cache()
    val nReady = ready.count()

    val envs = ready.map(r => Naming.runEnv(r, cfg, now))

    // A13 + A15: side-effecting stages — localCheckpoint materializes the
    // statuses exactly once so no retry/lineage replay re-runs subprocesses.
    val statuses0 = ExternalProcess.convert(envs, cfg).localCheckpoint(eager = true)
    val statuses = ArchiveSink.archive(statuses0, cfg, now).localCheckpoint(eager = true)

    // A6 + A14: ledger updates
    val statusDf = statuses.toDF()
    ledger.appendConverted(statusDf)
    ledger.recordFailures(statusDf)

    appendHistory(spark, cfg, statusDf, now)

    // A16 — throws on threshold breach, after bookkeeping (ALL_DONE ordering)
    val st = VerifyGate.stats(statuses)
    VerifyGate.check(st, cfg.failThreshold)

    discovered.unpersist(); pending.unpersist(); ready.unpersist()
    CycleResult(nDiscovered, nPending, nReady, st)
  }

  /** Quiescence gate: current sizes join the persisted clock table through
    * the pure Quiescence.advance transition; ready rows flow on, the updated
    * clock table is snapshot-swapped for the next cycle.
    */
  private def quiesce(
      spark: SparkSession,
      pending: Dataset[RunRecord],
      cfg: GraftConfig,
      now: Instant): Dataset[RunRecord] = {
    import spark.implicits._
    val nowS = now.getEpochSecond
    val statePath = s"${cfg.stateDir}/quiet"

    val observed = pending.map { r =>
      (r.path, r.plateRel, r.base, Discovery.dirSizeBytes(Paths.get(r.path)))
    }.toDF("path", "plateRel", "base", "size")

    val prev: DataFrame =
      if (Files.exists(Paths.get(statePath))) spark.read.parquet(statePath)
      else Seq.empty[(String, Long, Long)].toDF("path", "lastSize", "stableSince")

    val joined = observed.join(prev, Seq("path"), "left")
      .as[(String, String, String, Long, Option[Long], Option[Long])]

    val decided = joined.map { case (path, plateRel, base, size, lastSize, since) =>
      val prevState = for (ls <- lastSize; ss <- since)
        yield Quiescence.QuietState(ls, ss)
      val d = Quiescence.advance(prevState, size, nowS, cfg.quietS)
      (path, plateRel, base, d.state.lastSize, d.state.stableSinceEpochS, d.ready)
    }.toDF("path", "plateRel", "base", "lastSize", "stableSince", "ready")
      .localCheckpoint(eager = true) // decouple from prev before the swap below

    swapState(spark, decided.where(!col("ready"))
      .select("path", "lastSize", "stableSince"), statePath)

    decided.where(col("ready"))
      .select("path", "plateRel", "base").as[RunRecord]
  }

  private def swapState(spark: SparkSession, df: DataFrame, livePath: String): Unit = {
    val tmp = livePath + ".swap"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val live = Paths.get(livePath)
    val old = Paths.get(livePath + ".old")
    if (Files.exists(live))
      Files.move(live, old, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.move(Paths.get(tmp), live, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old)) {
      val stream = Files.walk(old)
      try stream.sorted(java.util.Comparator.reverseOrder()).forEach(Files.deleteIfExists(_))
      finally stream.close()
    }
  }

  /** Run-history table — the engine's task_instance analog; the B1-B9
    * analytics queries run over it (SURVEY.md §7.2.h).
    */
  private def appendHistory(
      spark: SparkSession, cfg: GraftConfig, statuses: DataFrame, now: Instant): Unit = {
    if (statuses.isEmpty) return
    statuses
      .withColumn("cycleTs", lit(new Timestamp(now.toEpochMilli)))
      .write.mode(SaveMode.Append).parquet(s"${cfg.stateDir}/history")
  }

  /** History table, or a schema-correct empty frame if no cycle has written
    * yet — so dashboard queries compile (and return empties) either way.
    *
    * Read with mergeSchema and backfill: the history dir is append-only
    * across engine versions, so files written before a RunStatus field
    * existed (e.g. origBytes/archiveBytes) must still read — merged schema,
    * missing columns zero-filled — rather than depend on which file's
    * footer wins schema inference.
    */
  def history(spark: SparkSession, cfg: GraftConfig): DataFrame = {
    import spark.implicits._
    val p = s"${cfg.stateDir}/history"
    if (!Files.exists(Paths.get(p)))
      return spark.emptyDataset[RunStatus].toDF()
        .withColumn("cycleTs", lit(null).cast("timestamp"))
    var df = spark.read.option("mergeSchema", "true").parquet(p)
    for (c <- Seq("origBytes", "archiveBytes"))
      if (!df.columns.contains(c)) df = df.withColumn(c, lit(0L))
    df.na.fill(0L, Seq("origBytes", "archiveBytes"))
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
}
