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

  test("maxPartitionBytes sizes the input splits (spill-control knob)") {
    // the read-side memory-budget knob: lowering maxPartitionBytes must cut
    // the same file into more, smaller input partitions — how executor
    // memory is protected when 100 TB of parquet meets a fixed heap
    val saved = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val openCost = spark.conf.get("spark.sql.files.openCostInBytes")
    // sf0.1's lineitem (~MBs) is large enough that the split budget, not
    // the bytes-per-core floor, decides the partitioning
    def partsWith(maxBytes: String): Int =
      try {
        spark.conf.set("spark.sql.files.maxPartitionBytes", maxBytes)
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        spark.read.parquet(s"$sf01/lineitem.parquet").rdd.getNumPartitions
      } finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", saved)
        spark.conf.set("spark.sql.files.openCostInBytes", openCost)
      }
    val coarse = partsWith("128MB")
    val fine = partsWith("64KB")
    assert(fine > coarse,
      s"smaller split budget must yield more input partitions: $fine vs $coarse")
  }
}
