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
    // ad-hoc conf experiments: SPARK_GRAFT_EXTRA_CONFS="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = ArrayBuffer.empty[StageRow]
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        if (collecting) {
          val si = ev.stageInfo
          val tm = si.taskMetrics
          rows += StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(90),
            si.numTasks, tm.executorRunTime, tm.executorCpuTime / 1000000,
            tm.shuffleReadMetrics.totalBytesRead / 1e6,
            tm.shuffleWriteMetrics.bytesWritten / 1e6,
            tm.inputMetrics.bytesRead / 1e6,
            (tm.memoryBytesSpilled + tm.diskBytesSpilled) / 1e6)
        }
      }
    })
    val q = SparkEntry.queries
    for (name <- args) q.get(name) match {
      case Some(fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
        rows.clear()
        collecting = true
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val wallS = (System.nanoTime() - t0) / 1e9
        // let straggling stage-completed events drain
        Thread.sleep(300)
        collecting = false
        println(f"\n=== $name wall=$wallS%.2f s rows=$n stages=${rows.size}")
        println(f"${"id"}%5s ${"tasks"}%5s ${"run_ms"}%8s ${"cpu_ms"}%8s " +
          f"${"in_MB"}%7s ${"sr_MB"}%7s ${"sw_MB"}%7s ${"spill"}%6s  name")
        rows.sortBy(-_.runMs).take(25).foreach { r =>
          println(f"${r.id}%5d ${r.tasks}%5d ${r.runMs}%8d ${r.cpuMs}%8d " +
            f"${r.inputMB}%7.1f ${r.shufReadMB}%7.1f ${r.shufWriteMB}%7.1f " +
            f"${r.spillMB}%6.1f  ${r.name}")
        }
        val totRun = rows.map(_.runMs).sum
        println(f"sum run_ms=$totRun (over ${cpus} cores => ~${totRun / 1e3 / cpus.toInt}%.2f s if perfectly parallel)")
      case None => println(s"unknown query '$name'")
    }
    spark.stop()
  }
}
