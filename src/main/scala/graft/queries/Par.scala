package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Kernel fan-out (round 15, guide §2.5/§2.6): hash kernels (per-shingle
  * md5 families, SimHash vote folds, media decode) concentrate seconds of
  * CPU per input megabyte, so their parallelism must be sized to the
  * CORES, not to the bytes — while both of Spark's byte-based sizing
  * mechanisms do the opposite on kernel-dense inputs:
  *
  *  - scan splits: a parquet scan packs files into
  *    `maxPartitionBytes`-sized splits with a 4 MB `openCostInBytes`
  *    charge, so a few-MB fixture (or any corpus whose per-byte CPU is
  *    huge) lands on 1-4 tasks — measured round 15: x332's whole 16-hash
  *    signature build ran as ONE 4.0 s task on a 32-core box, x74's GIF
  *    decode as one 1.9 s task;
  *  - AQE partition coalescing: every downstream exchange is re-coalesced
  *    toward `advisoryPartitionSizeInBytes`/`minPartitionSize`, so even a
  *    32-partition shuffle collapses back to 1-4 tasks when the shuffled
  *    bytes are small — which they always are here, because these
  *    pipelines deliberately shuffle keys and signatures, never text
  *    (guide §2.3). The verify joins then evaluate their set-intersection
  *    projections nearly serially (x340's truth verify: 7.5 s over 3
  *    tasks).
  *
  * Both fixes derive the partition count from
  * `spark.sql.shuffle.partitions` — the deploy-configured parallelism
  * knob (cpus locally, raised by cluster config at scale) — never a
  * constant, per the scale-adaptive rule.
  */
private[queries] object Par {

  /** The session's configured shuffle parallelism — the one deploy knob
    * every fan-out below keys off.
    */
  def parallelism(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Fan a SCAN-shaped input out to the session parallelism before a
    * CPU-dense kernel, keyed (deterministic hash distribution — no
    * round-robin, no sort-before-repartition) — but ONLY when the scan
    * is narrower than the session parallelism: at 100 TB the scan
    * already carries more partitions than cores and the repartition
    * would be a pure-cost coalesce of the payload, so it vanishes there
    * by construction. The partition probe is metadata (file splits), not
    * a job.
    */
  def fanOutScan(df: DataFrame, key: String): DataFrame = {
    val np = parallelism(df)
    if (df.rdd.getNumPartitions < np) df.repartition(np, col(key)) else df
  }

  /** Pin a candidate-pair / verify-join input to the session parallelism
    * with an EXPLICIT keyed repartition: AQE never re-coalesces a
    * user-specified partition count, so the expensive verify projection
    * that follows the join runs at the configured width. Applied to
    * pair/signature tables only — metadata-light rows whose shuffle is
    * already part of the join (pinning the count moves no extra bytes
    * beyond the ≤ a-few-MB pair keys).
    */
  def fanOutJoin(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(parallelism(df), keys: _*)
}
