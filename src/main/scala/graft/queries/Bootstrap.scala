package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Poisson-bootstrap kernel (Chamandy et al. 2012) — ONE definition
  * of the replicate weights, accumulators and verdict shared by the x260
  * registry row and [[graft.streaming.BootstrapStream]], so the
  * advertised stream ≡ batch weight identity is enforced by construction
  * (the 7 inverse-CDF hex thresholds exist in exactly one place).
  *
  * Weights: for (row key, replicate b), the first 4 hex chars of
  * md5(key:b) are compared against FIXED thresholds — the cumulative
  * Poisson(1) CDF quantized to the 16-bit hex lattice (24109/65536 ≈
  * e⁻¹ etc.), the x42 string-ordered-hash idiom. No float RNG; both
  * engines draw bit-identical weights.
  */
object Bootstrap {

  /** Replicate accumulators for a (key, cents) frame: 32 rows of
    * (b, swx, sw) — integer sums, so deltas MERGE by addition (the
    * property the streaming maintainer is built on).
    */
  def accumulate(rows: DataFrame): DataFrame =
    rows.select(col("key"), col("cents"),
        explode(expr("sequence(1, 32)")).as("b"))
      .withColumn("h",
        substring(md5(concat(col("key"), lit(":"), col("b"))), 1, 4))
      .withColumn("w", expr("""case
           when h < '5e2d' then 0 when h < 'bc5e' then 1
           when h < 'eb79' then 2 when h < 'fb2b' then 3
           when h < 'ff10' then 4 when h < 'ffd9' then 5
           when h < 'fffa' then 6 else 7 end"""))
      .groupBy("b")
      .agg(sum(expr("cast(w * cents as decimal(38,0))")).as("swx"),
        sum(col("w")).as("sw"))

  /** Exact totals for the point estimate: (n_rows, sum_cents). */
  def totals(rows: DataFrame): DataFrame =
    rows.agg(count(lit(1)).as("n_rows"),
      coalesce(sum(col("cents")), lit(0L)).as("sum_cents"))

  /** One-row verdict from accumulators + totals: n, exact mean, and the
    * 2nd/31st order statistics of the replicate means (the 30/32 ≈ 94 %
    * central band). TOTAL on starved inputs: with fewer than 31 (or 2)
    * live replicates — only possible for tiny row counts, where each
    * replicate empties with probability e⁻ⁿ — the order statistic is
    * absent and the published band collapses to zero width at the point
    * estimate (the no-evidence convention of the drift family), never a
    * null an unboxing reader trips on.
    */
  def verdict(acc: DataFrame, tot: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val band = acc.where(col("sw") > 0L)
      .select(col("b"), expr("cast(swx div sw as bigint)").as("mean_b"))
      .withColumn("rn", row_number().over(Window.orderBy("mean_b")))
      .agg(max(when(col("rn") === 2, col("mean_b"))).as("lo"),
        max(when(col("rn") === 31, col("mean_b"))).as("hi"))
    tot.crossJoin(broadcast(band))
      .withColumn("mean_cents",
        when(col("n_rows") === 0L, lit(0L))
          .otherwise(expr("sum_cents div n_rows")))
      .select(col("n_rows"), col("mean_cents"),
        coalesce(col("lo"), col("mean_cents")).as("ci_lo_cents"),
        coalesce(col("hi"), col("mean_cents")).as("ci_hi_cents"))
  }
}
