package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Fixture-table loaders (schemas documented in /root/repo/FIXTURES.md).
  *
  * All loads are plain parquet scans so Catalyst predicate pushdown / column
  * pruning reach the file source. At 100 TB these would be partitioned table
  * paths; the API stays identical.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark only reads via
    // spark.sql.legacy.parquet.nanosAsLong (set in every graft session
    // builder) as nanos-since-epoch. Truncate to Spark's native microsecond
    // TimestampType — the same truncation DuckDB applies casting ns → µs.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register the given tables (default: all) as temp views for spark.sql. */
  def views(spark: SparkSession, dir: String, names: Seq[String] = all): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
