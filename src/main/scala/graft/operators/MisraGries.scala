package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitter summaries (Misra & Gries 1982), in the
  * MERGEABLE form of Agarwal et al., "Mergeable Summaries" (PODS 2012,
  * §3.1): a capacity-k summary keeps at most k (item, count) pairs; two
  * summaries merge by adding counts item-wise and subtracting the
  * (k+1)-th largest merged count from every survivor, dropping the
  * non-positive. The merged summary carries the SAME guarantee as a
  * one-shot pass over the union:
  *
  *   true(x) − n/(k+1)  ≤  est(x)  ≤  true(x)
  *
  * (n = total items summarized; absent items have est 0), so every item
  * with true frequency above n/(k+1) survives — the frequent-token /
  * frequent-key monitor a pipeline maintains incrementally where x20's
  * one-shot freqItems would re-scan the corpus. The same subtract-the-
  * (k+1)-th rule turns an EXACT count table into its best k-summary,
  * which is how a batch enters the fold: exact per-batch counts (one
  * map-side-combinable aggregate — the only fact-sized step), then the
  * domain-sized compress.
  *
  * Everything here is integer arithmetic on (item, count, weight) rows;
  * the summary tables are k-bounded, so merges move k rows however large
  * the summarized inputs were. Estimates are deterministic for a given
  * batch split (compress and merge are rank arithmetic over exact
  * counts, not per-row streaming updates); the GUARANTEE is
  * split-invariant, which is what FreqMaintainSpec pins.
  */
object MisraGries {

  /** Schema: item STRING, cnt LONG (the lower-bound estimate), plus the
    * summarized item total `n` carried on every row (a k-bounded table
    * can afford the denormalized constant; it makes the error bound of
    * any generation self-describing).
    */
  val Columns: Seq[String] = Seq("item", "cnt", "n")

  /** The shared subtract-the-(k+1)-th compress over an ALREADY-BOUNDED
    * count table (≤ k+1 rows after the caller's TakeOrdered, or ≤ 2k
    * from a summary union): the global windows here touch only that
    * bounded table — never a fact- or domain-sized one — so the
    * single-partition WindowExec is k rows of work by construction.
    */
  private def compressBounded(bounded: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy(col("cnt").desc, col("item"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    bounded
      .withColumn("rk", row_number().over(w))
      .withColumn("sub",
        max(when(col("rk") === k + 1, col("cnt"))).over(all))
      .withColumn("cnt", col("cnt") - coalesce(col("sub"), lit(0L)))
      // the rank-1 row survives even at est 0 (an all-ties compress zeroes
      // every estimate): a 0 estimate is semantically identical to absence
      // under the MG bound (est ≤ true, true − est ≤ n/(k+1) hold either
      // way), but the surviving row is what CARRIES the summarized total
      // `n` — an empty summary would silently lose n and every later
      // merge would under-state the bound the artifact is read by
      .where(col("rk") <= k && (col("cnt") > 0 || col("rk") === 1))
      .select(col("item"), col("cnt").cast("long").as("cnt"))
  }

  /** Compress an EXACT (item, cnt) count table to its capacity-k MG
    * summary: subtract the (k+1)-th largest count (0 when there are at
    * most k items), keep positives. `n` = the exact total — recorded so
    * the summary's error bound n/(k+1) reads off the artifact.
    *
    * Scale shape: the (k+1)-th largest needs only the top k+1 counts, so
    * the count table reduces through a TakeOrderedAndProject (distributed
    * partial top-k, never a global sort of the item domain) plus one
    * 1-row total aggregate; the subtract/filter then runs on k+1 rows.
    */
  def fromCounts(counts: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"capacity must be >= 1: $k")
    val tot = counts.agg(coalesce(sum(col("cnt")), lit(0L)).as("n"))
    val top = counts.orderBy(col("cnt").desc, col("item")).limit(k + 1)
    compressBounded(top, k)
      .crossJoin(broadcast(tot))
      .select(col("item"), col("cnt"), col("n").cast("long").as("n"))
  }

  /** Merge two capacity-k summaries (Agarwal et al. §3.1): item-wise
    * count addition, then the same (k+1)-th-largest subtraction. Totals
    * add — the bound for the merged summary is (n1+n2)/(k+1). Both
    * inputs are k-bounded, so the whole merge moves ≤ 2k rows, and the
    * result is ONE lazy plan: the totals ride 1-row aggregates through a
    * broadcast cross join (the fromCounts shape) instead of eager
    * driver .head() actions, so composing merges stays free and a
    * streaming maintainer pays exactly one job per fold.
    */
  def merge(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val tot = a.agg(coalesce(max(col("n")), lit(0L)).as("na"))
      .crossJoin(b.agg(coalesce(max(col("n")), lit(0L)).as("nb")))
      .select((col("na") + col("nb")).as("n"))
    val added = a.select(col("item"), col("cnt"))
      .unionAll(b.select(col("item"), col("cnt")))
      .groupBy(col("item")).agg(sum(col("cnt")).as("cnt"))
    compressBounded(added, k)
      .crossJoin(broadcast(tot))
      .select(col("item"), col("cnt"), col("n").cast("long").as("n"))
  }

  /** One-shot capacity-k summary of a token column: exact counts (the
    * only fact-sized step, map-side combinable) then compress.
    */
  def summarize(df: DataFrame, itemCol: String, k: Int): DataFrame =
    fromCounts(
      df.select(col(itemCol).as("item"))
        .groupBy(col("item")).agg(count(lit(1)).as("cnt")),
      k)
}
