package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gates for the x33 chunked-carry sequence packing: the distributed form
  * must be row-identical to the naive per-language window (whose
  * correctness the DuckDB oracle pins), AND must actually parallelize the
  * fill of a single giant stratum — the 100 TB failure mode of the naive
  * plan (one window task per language serializes a 90 %-English corpus).
  */
class SequencePackingSpec extends SparkSpec {

  /** The naive single-window form x33 used to be — the semantic reference. */
  private def naiveBins(d: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        floor(col("cum_before") / 2048L).as("bin"))
      .orderBy("lang", "doc_id")
  }

  test("x33 chunked-carry bins equal the naive per-language window form") {
    val naive = naiveBins(Tables(spark, sf001, "documents")).collect().toSeq
    val chunked = SparkEntry.queries("x33_sequence_packing")(spark, sf001)
      .collect().toSeq
    assert(chunked == naive, "carry offsets must reproduce the global fill exactly")
  }

  test("a single giant stratum fills in multiple tasks, and identically") {
    import spark.implicits._
    // one-language corpus: the naive plan puts ALL filling in one window
    // task; the chunked carry must spread it across the bucket partitions.
    // AQE correctly coalesces this tiny shuffle to one partition, so pin
    // the parallelism with coalescing off — at real scale each bucket
    // partition is far above the advisory size and stays separate.
    val d = (0L until 400L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      val filled = Text.packedBins(d, bucketWidth = 32L)
      val pids = filled.withColumn("pid", spark_partition_id())
        .select("pid").distinct().collect().map(_.getInt(0)).toSeq
      assert(pids.size > 1,
        s"giant-stratum fill ran as a single task (partitions: $pids)")
    } finally spark.conf.set(coalesceKey, saved)
    assert(
      Text.packedBins(d, bucketWidth = 32L).orderBy("lang", "doc_id").collect().toSeq
        == naiveBins(d).collect().toSeq,
      "bucketed fill must equal the naive fill on the giant stratum")
  }

  test("x33 plan: the cumulative fill windows by (lang, bucket); per-lang windows see only aggregated rows") {
    val df = SparkEntry.queries("x33_sequence_packing")(spark, sf001)
    df.collect() // finalize AQE so the executed plan is the real one
    val nodes = SparkSpec.allPlanNodes(df.queryExecution.executedPlan)
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected window operators in the x33 plan")
    assert(windows.exists(_.partitionSpec.size == 2),
      "the fill window must partition by (lang, bucket) — a lang-only fill " +
        "window is the single-task-per-language plan this operator replaces")
    // any narrower window may only run over the per-bucket totals table —
    // bounded at |langs|·|buckets| rows by the upstream aggregate
    for (w <- windows if w.partitionSpec.size < 2)
      assert(SparkSpec.allPlanNodes(w.child).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.aggregate.BaseAggregateExec]),
        s"per-lang window must sit above the bucket-totals aggregate: $w")
  }
}
