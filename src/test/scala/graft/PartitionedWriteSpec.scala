package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Partitioned storage layout (SURVEY.md §1.1: plate = partition key): data
  * written partitionBy a key reads back with partition PRUNING — a filter on
  * the partition column scans only its directory, the property that turns
  * "scan 100 TB" into "scan one plate" for per-plate queries.
  */
class PartitionedWriteSpec extends SparkSpec {

  test("partitionBy write + partition-pruned read") {
    val out = Files.createTempDirectory("graft-part").resolve("events_by_type").toString
    Tables(spark, sf001, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    // layout: one directory per key
    val dirs = Files.list(Paths.get(out)).iterator()
    var partDirs = 0
    while (dirs.hasNext) {
      val d = dirs.next()
      if (d.getFileName.toString.startsWith("event_type=")) partDirs += 1
    }
    assert(partDirs == 5, s"expected 5 partition dirs, got $partDirs")

    val df = spark.read.parquet(out).where(col("event_type") === "purchase")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"filter must prune partitions, not scan them:\n$plan")

    val expected = Tables(spark, sf001, "events")
      .where(col("event_type") === "purchase").count()
    assert(df.count() == expected)
  }
}
