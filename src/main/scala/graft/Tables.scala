package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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
    // events.ts normalizes to Spark's native (UTC-instant) TimestampType
    // whatever the fixture's footer says. The generator has shipped two
    // forms: TIMESTAMP(NANOS) — readable only via the
    // spark.sql.legacy.parquet.nanosAsLong conf (set in every graft
    // session builder) as nanos-since-epoch, truncated here to µs exactly
    // as DuckDB truncates ns → µs — and TIMESTAMP(MICROS, NTZ), which the
    // cast interprets in the session timezone (pinned UTC in build.sbt +
    // every session builder, so the instant is unambiguous).
    if (name == "events") df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
    else df
  }

  /** Register the given tables (default: all) as temp views for spark.sql. */
  def views(spark: SparkSession, dir: String, names: Seq[String] = all): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
