package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Dev profiling (builder-side only, never run by the driver): per-stage
  * breakdown of one or more registry queries — where each second goes
  * (executor run time, shuffle bytes, task counts), the guide-§7 stage
  * view without the UI. Usage:
  *   sbt "runMain graft.ProfileStages x340_lsh_tuning_curve [more...]"
  * Each query runs twice (warm at sf0.001, then timed at sf0.1); stages
  * of the timed run print in completion order.
  */
object ProfileStages {
  private case class StageRow(id: Int, name: String, tasks: Int,
      runMs: Long, cpuMs: Long, shufReadMB: Double, shufWriteMB: Double,
      inputMB: Double, spillMB: Double)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf experiments: SPARK_GRAFT_EXTRA_CONFS="k=v;k=v" — blank
    // segments (trailing ';') are skipped; a segment without '=' fails
    // LOUDLY naming itself rather than as an opaque MatchError (ADVICE r14)
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(
      _.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_EXTRA_CONFS segment without '=': '$kv'")
        }
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // listener-bus thread writes, main thread reads: flag volatile, rows
    // guarded by its own monitor (ADVICE r14)
    val rows = ArrayBuffer.empty[StageRow]
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        if (collecting) {
          val si = ev.stageInfo
          // taskMetrics is null for stages with no successful task
          // (failed/cancelled) — emit a zeroed marker row, don't NPE into
          // the listener bus's swallowed-exception void (ADVICE r14)
          Option(si.taskMetrics) match {
            case Some(tm) => rows.synchronized {
              rows += StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(90),
                si.numTasks, tm.executorRunTime, tm.executorCpuTime / 1000000,
                tm.shuffleReadMetrics.totalBytesRead / 1e6,
                tm.shuffleWriteMetrics.bytesWritten / 1e6,
                tm.inputMetrics.bytesRead / 1e6,
                (tm.memoryBytesSpilled + tm.diskBytesSpilled) / 1e6)
            }
            case None => rows.synchronized {
              rows += StageRow(si.stageId,
                "(metrics unavailable) " + si.name.takeWhile(_ != '\n').take(68),
                si.numTasks, 0L, 0L, 0, 0, 0, 0)
            }
          }
        }
      }
    })
    val q = SparkEntry.queries
    for (name <- args) q.get(name) match {
      case Some(fn) =>
        // a silently failed warm-up would time a cold JIT path — warn
        // (NonFatal only; let OOM etc. propagate) (ADVICE r14)
        try fn(spark, warmDir).count() catch {
          case scala.util.control.NonFatal(e) => println(
            s"[profile] warm-up for $name failed: ${e.getClass.getSimpleName}")
        }
        rows.synchronized(rows.clear())
        collecting = true
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val wallS = (System.nanoTime() - t0) / 1e9
        // drain the listener bus via a sentinel no-op job (ADVICE r14):
        // events are delivered in order per queue, so once the sentinel's
        // own stage-completed lands, every stage of the timed query has
        // too (SparkContext.listenerBus is private[spark] — the sentinel
        // is the public-API drain). Bounded poll, then a short settle.
        val preSentinel = rows.synchronized(rows.size)
        spark.sparkContext.parallelize(Seq(1), 1).count()
        var waited = 0
        while (waited < 5000 && rows.synchronized(rows.size) <= preSentinel) {
          Thread.sleep(20); waited += 20
        }
        collecting = false
        // the sentinel's own row is noise — drop it from the report
        val snap = rows.synchronized(rows.toList)
          .filterNot(_.name.contains("ProfileStages"))
        println(f"\n=== $name wall=$wallS%.2f s rows=$n stages=${snap.size}")
        println(f"${"id"}%5s ${"tasks"}%5s ${"run_ms"}%8s ${"cpu_ms"}%8s " +
          f"${"in_MB"}%7s ${"sr_MB"}%7s ${"sw_MB"}%7s ${"spill"}%6s  name")
        snap.sortBy(-_.runMs).take(25).foreach { r =>
          println(f"${r.id}%5d ${r.tasks}%5d ${r.runMs}%8d ${r.cpuMs}%8d " +
            f"${r.inputMB}%7.1f ${r.shufReadMB}%7.1f ${r.shufWriteMB}%7.1f " +
            f"${r.spillMB}%6.1f  ${r.name}")
        }
        val totRun = snap.map(_.runMs).sum
        println(f"sum run_ms=$totRun (over ${cpus} cores => ~${totRun / 1e3 / cpus.toInt}%.2f s if perfectly parallel)")
      case None => println(s"unknown query '$name'")
    }
    spark.stop()
  }
}
