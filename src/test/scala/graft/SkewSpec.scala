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
}
