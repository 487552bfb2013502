package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (builder-side only, never run by the driver): write
  * `explain("formatted")` for the named registry queries to files — the
  * per-round `plans/r<N>/<query>_<suffix>.txt` evidence the optimization
  * rounds commit (guide §1: capture the plan shape for every query
  * touched, before and after).
  *
  * Usage:
  *   sbt "runMain graft.DumpPlans plans/r15 before x340_lsh_tuning_curve ..."
  * writes plans/r15/x340_lsh_tuning_curve_before.txt etc. The session
  * mirrors Bench (same master/shuffle-partition/AQE settings), so the
  * dumped plan is the one the bench executes.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlans <outDir> <suffix> <query>...")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val q = SparkEntry.queries
    for (name <- names) q.get(name) match {
      case Some(fn) =>
        val txt = try {
          val df = fn(spark, dir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"explain failed: $e" }
        val path = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
        java.nio.file.Files.write(path, txt.getBytes("UTF-8"))
        println(s"wrote $path")
      case None => println(s"unknown query '$name'")
    }
    spark.stop()
  }
}
