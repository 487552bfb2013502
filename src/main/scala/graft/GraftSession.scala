package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every graft entry point shares.
  *
  * Local test runs use `local[N]`; on a real cluster the same builder works
  * with the master injected by spark-submit. Shuffle partitions default to the
  * local core count (the driver contract pins 32 threads / 32 partitions) —
  * AQE coalesces further at runtime, and on a 1000-executor cluster the
  * `spark.sql.shuffle.partitions` setting would be raised by deploy config,
  * not code.
  */
object GraftSession {
  def local(appName: String = "graft", cores: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Fixture timestamps are TIMESTAMP(MICROS, isAdjustedToUTC=false);
      // read them as plain TimestampType (session tz is pinned UTC below, so
      // the instant is unambiguous) rather than TIMESTAMP_NTZ — keeps every
      // downstream timestamp expression and oracle comparison on the native
      // UTC-instant type.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
