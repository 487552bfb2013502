package graft

import org.apache.spark.sql.functions._

/** Skew-mitigation pattern (SURVEY.md §4 / prompt "salting for skew"): a
  * two-phase salted aggregation must be value-identical to the direct
  * aggregation. On a real cluster the salt spreads one hot key over N
  * reducers; AQE's skew-join handling covers the join case, this is the
  * aggregation case.
  */
class SkewSpec extends SparkSpec {

  test("salted two-phase aggregation equals direct aggregation") {
    import spark.implicits._
    // skewed input: one hot key dominating
    val df = ((1 to 50000).map(i => ("hot", i.toLong)) ++
      (1 to 500).map(i => (s"cold_${i % 7}", i.toLong)))
      .toDF("k", "v")

    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val nSalts = 16
    val salted = df
      .withColumn("salt", pmod(hash(monotonically_increasing_id()), lit(nSalts)))
      .groupBy("k", "salt") // phase 1: partial per (key, salt)
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .groupBy("k") // phase 2: merge partials
      .agg(sum("s").as("s"), sum("n").as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(salted == direct)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    // one hot key carrying ~all the fact rows; thresholds lowered so the
    // skew is visible at test scale (the defaults target multi-GB partitions)
    val fact = ((1 to 200000).map(i => (1L, i.toLong)) ++
      (1 to 2000).map(i => ((i % 50 + 2).toLong, i.toLong))).toDF("k", "v")
    val dim = (1L to 60L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ so skew handling applies
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = fact.join(dim, "k")
      assert(joined.collect().length == 202000)
      val plan = (joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }).toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed join for split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
