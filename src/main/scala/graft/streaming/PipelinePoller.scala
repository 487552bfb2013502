package graft.streaming

import java.time.Instant
import org.apache.spark.sql.SparkSession
import graft.pipeline.{GraftConfig, PipelineRunner}

/** The reference's scheduler loop (5-minute cron schedule_interval,
  * catchup=False, max_active_runs=1 — dags/msconvert_dag.py:164-173) as a
  * single-threaded poller: one cycle at a time, fixed sleep between cycle
  * starts, no catchup of missed ticks.
  *
  * Cycles run serially by construction (max_active_runs=1); a cycle that
  * exceeds the interval simply delays the next one, exactly like Airflow
  * with max_active_runs=1. A VerifyGate failure marks the cycle failed and
  * the loop continues — the DagRun fails, the DAG keeps scheduling.
  *
  * Config is a thunk re-evaluated at each cycle start, mirroring the
  * reference's per-DagRun Jinja re-read of Airflow Variables
  * (dags/msconvert_dag.py:274-275): an operator can flip GZIP_OUT or
  * ARCHIVE_POLICY in the backing store and the next cycle picks it up
  * without a redeploy.
  */
final class PipelinePoller(
    spark: SparkSession,
    cfgFn: () => GraftConfig,
    intervalS: Int = 300) {

  /** Fixed-config convenience (tests, one-shot CLIs). */
  def this(spark: SparkSession, cfg: GraftConfig, intervalS: Int) =
    this(spark, () => cfg, intervalS)

  @volatile private var stopped = false
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def stop(): Unit = stopped = true

  /** Run up to `maxCycles` cycles (Int.MaxValue = forever). Returns per-cycle
    * results (failed cycles recorded as Left(message)).
    */
  def run(maxCycles: Int = Int.MaxValue): Seq[Either[String, PipelineRunner.CycleResult]] = {
    val results = Seq.newBuilder[Either[String, PipelineRunner.CycleResult]]
    var i = 0
    while (i < maxCycles && !stopped) {
      val t0 = System.currentTimeMillis()
      val cfg = cfgFn() // Variable re-read: fresh config each cycle
      val r =
        try Right(PipelineRunner.runCycle(spark, cfg, Instant.now()))
        catch {
          case e: graft.pipeline.VerifyGate.BatchFailedException =>
            log.warn(s"cycle failed verify: ${e.getMessage}")
            Left(e.getMessage)
        }
      results += r
      i += 1
      if (i < maxCycles && !stopped) {
        val elapsed = System.currentTimeMillis() - t0
        val sleepMs = math.max(0L, intervalS * 1000L - elapsed)
        try Thread.sleep(sleepMs)
        catch { case _: InterruptedException => stopped = true }
      }
    }
    results.result()
  }
}
