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

  test("sort-on-write enables parquet row-group skipping for range filters") {
    // the other half of the storage-layout story next to partition pruning:
    // within a partition, sorting by the range-filtered column clusters each
    // row group's min/max stats so a narrow predicate skips whole row
    // groups. At 100 TB this is the difference between "read the partition"
    // and "read three row groups of it". Measured via the scan's
    // numOutputRows (rows surviving row-group/page-level pushdown, before
    // Spark's residual Filter).
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      SparkSpec.allPlanNodes(df.queryExecution.executedPlan)
        .collect { case s: FileSourceScanExec => s }
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
    }
    // Sort key is the BIGINT orderkey: Spark's ParquetFilters translates
    // long/int/string/date predicates into parquet FilterPredicates, but NOT
    // TimestampNTZType — an l_shipdate sort would show pushed filters in the
    // plan yet skip nothing (measured: 600k of 600k rows scanned). Range
    // columns meant for data skipping must be stored as date/long at 100 TB.
    val li = Tables(spark, sf01, "lineitem")
    val total = li.count()
    val base = Files.createTempDirectory("graft-sorted").toString
    // ~128 KB row groups so sf0.1's lineitem spans many groups per file
    li.sort("l_orderkey").coalesce(2).write
      .option("parquet.block.size", 128 * 1024)
      .mode("overwrite").parquet(s"$base/sorted")
    li.orderBy(rand(7)).coalesce(2).write
      .option("parquet.block.size", 128 * 1024)
      .mode("overwrite").parquet(s"$base/shuffled")
    def narrow(path: String) = spark.read.parquet(path)
      .where(col("l_orderkey") >= 10000 && col("l_orderkey") < 11000)
    val sortedScan = scanRows(narrow(s"$base/sorted"))
    val shuffledScan = scanRows(narrow(s"$base/shuffled"))
    assert(narrow(s"$base/sorted").count() == narrow(s"$base/shuffled").count())
    assert(sortedScan < total / 5,
      s"sorted layout must skip most row groups: scanned $sortedScan of $total")
    assert(shuffledScan > sortedScan * 4,
      s"unsorted layout cannot skip: $shuffledScan vs sorted $sortedScan")
  }

  test("z-order layout skips row groups for predicates on EITHER clustered column") {
    // linear sort clusters stats for one leading column only; the Morton
    // key bounds every row group's span in both dimensions. Narrow
    // predicate on the NON-leading column: the linear layout scans ~all
    // rows, the z-ordered layout skips most groups.
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      SparkSpec.allPlanNodes(df.queryExecution.executedPlan)
        .collect { case s: FileSourceScanExec => s }
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
    }
    val li = Tables(spark, sf01, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val total = li.count()
    val base = Files.createTempDirectory("graft-zorder").toString
    val opts = Map("parquet.block.size" -> (128 * 1024).toString)
    li.sort(graft.functions.ZOrder.zvalue(col("l_orderkey"), col("l_partkey"), 21))
      .coalesce(2).write.options(opts).mode("overwrite").parquet(s"$base/z")
    li.sort("l_orderkey")
      .coalesce(2).write.options(opts).mode("overwrite").parquet(s"$base/linear")
    // predicate on the non-leading dimension (l_partkey)
    def byPart(p: String) = spark.read.parquet(p)
      .where(col("l_partkey") >= 1000 && col("l_partkey") < 1500)
    val zPart = scanRows(byPart(s"$base/z"))
    val linPart = scanRows(byPart(s"$base/linear"))
    assert(byPart(s"$base/z").count() == byPart(s"$base/linear").count())
    // 40% bound, not 33%: the z write's global sort range-samples its
    // partition boundaries, so row-group spans (and the scanned count)
    // drift a few percent run to run — observed 30-34% across sessions;
    // the linPart comparison below is the load-bearing skip evidence
    assert(zPart < total * 2 / 5,
      s"z-order must skip for the second dimension: scanned $zPart of $total")
    assert(linPart > zPart * 2,
      s"linear layout cannot skip on the non-leading column: $linPart vs z $zPart")
    // predicate on the other dimension still skips under z-order (the trade:
    // weaker than a dedicated sort, far better than nothing)
    def byOrder(p: String) = spark.read.parquet(p)
      .where(col("l_orderkey") >= 10000 && col("l_orderkey") < 12000)
    val zOrd = scanRows(byOrder(s"$base/z"))
    assert(zOrd < total / 2,
      s"z-order must still skip on the first dimension: scanned $zOrd of $total")
  }

  test("dynamic partition pruning: a runtime dim filter prunes fact partitions") {
    // the 100 TB join pattern: fact partitioned on the join key, dim filter
    // only known at runtime — DPP turns the dim's selected keys into a
    // partition filter on the fact scan instead of scanning every partition
    import spark.implicits._
    val out = Files.createTempDirectory("graft-dpp").resolve("events_by_type").toString
    Tables(spark, sf001, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)
    // the dim must be a real scan with a runtime filter — a local literal
    // relation constant-folds the filter away and the DPP rule never fires
    val dimPath = Files.createTempDirectory("graft-dpp").resolve("dim").toString
    Seq(("purchase", "money"), ("signup", "money"), ("click", "traffic"),
      ("view", "traffic"), ("error", "ops")).toDF("event_type", "grp")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val fact = spark.read.parquet(out)
    val joined = fact.join(dim, Seq("event_type")).where(col("grp") === "money")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"dim filter must prune fact partitions at runtime:\n$plan")
    assert(joined.count() == 2, "only the two 'money' event types survive")
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

  test("dynamic partition overwrite replaces only the written partitions") {
    // the idempotent daily-backfill write: re-running one day's job must
    // replace THAT day's partition and leave every other day untouched
    // (static overwrite mode would drop the whole table first)
    val out = Files.createTempDirectory("graft-dyn").resolve("by_day").toString
    val e = Tables(spark, sf001, "events")
      .select(to_date(col("ts")).as("day"), col("event_id"), col("value"))
    e.write.partitionBy("day").mode("overwrite").parquet(out)
    val nTotal = spark.read.parquet(out).count()
    val someDay = spark.read.parquet(out).select(col("day"))
      .orderBy("day").limit(1).collect()(0).getDate(0)
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // "backfill" that day with a DOUBLED copy of its rows
      val day = e.where(col("day") === someDay)
      day.unionByName(day).write.partitionBy("day")
        .mode("overwrite").parquet(out)
      val after = spark.read.parquet(out)
      val dayN = day.count()
      assert(after.where(col("day") === someDay).count() == 2 * dayN,
        "the target partition must hold the backfilled rows")
      assert(after.count() == nTotal + dayN,
        "untouched partitions must survive the overwrite")
    } finally prevMode match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("schema evolution: mergeSchema reads old and new file generations") {
    // generation 1 writes (doc_id, source); generation 2 adds a column —
    // the evolving-corpus read every long-lived dataset needs
    val out = Files.createTempDirectory("graft-evol").resolve("docs").toString
    val docs = Tables(spark, sf001, "documents")
    docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("source"))
      .write.mode("overwrite").parquet(s"$out/gen=1")
    docs.where(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.schema.fieldNames.toSet ==
      Set("doc_id", "source", "n_chars", "gen"))
    // old generation surfaces NULL for the added column; new is populated
    assert(merged.where(col("gen") === 1 && col("n_chars").isNotNull).count() == 0)
    val gen2Nulls = merged.where(col("gen") === 2 && col("n_chars").isNull).count()
    assert(gen2Nulls == 0)
    assert(merged.count() == docs.count())
    // and a filter on the evolved column still prunes to gen 2 scans only
    val evolved = merged.where(col("n_chars") > 100)
    assert(evolved.count() ==
      docs.where(col("doc_id") % 2 === 1 && col("n_chars") > 100).count())
  }
}
