package graft.plans

import org.apache.spark.sql.DataFrame

/** Plan-fingerprint result cache — serve a repeated deterministic query
  * from its materialized result instead of recomputing (the dashboard /
  * scheduled-report accelerator: the reference's Grafana panels re-issue
  * the same five rollups on every refresh).
  *
  * The cache key is the canonicalized optimized plan's fingerprint
  * ([[graft.Bench.planFingerprint]] — the same hash the per-round
  * `plans_r<N>.json` artifact uses), so the key covers the full query
  * SHAPE including literals: a changed filter constant, column set, or
  * source path re-keys, while expression-id churn does not. Correctness
  * boundary stated plainly: the fingerprint does NOT see source-file
  * CONTENTS — serving cached results over mutated inputs is the caller's
  * decision, exactly as with any materialized view. Pair with
  * [[graft.StoredArtifacts.dir]]'s state-hashed roots (as the spec does)
  * to get input-sensitive keys: a regenerated fixture re-roots the cache
  * and stale entries are swept with the generation.
  *
  * Scale shape: a hit reads one parquet directory (the result, already
  * coalesced by the original write) and runs zero upstream jobs — the
  * spec pins that a hit's scan leaves are the cache files, not the
  * source tables. A miss pays the query once plus one write. Writes go
  * through a `_tmp` + atomic-rename commit so a crashed miss never
  * serves a half-written result (the ArchiveSink/.partial discipline);
  * the `_SUCCESS` marker gates readiness as everywhere else.
  */
object ResultCache {

  def fingerprint(df: DataFrame): String = graft.Bench.planFingerprint(df)

  /** Serve `df`'s result from `cacheRoot`, computing and committing it on
    * first touch. Returns a DataFrame whose lineage is the CACHE READ.
    */
  def run(df: DataFrame, cacheRoot: String): DataFrame = {
    val spark = df.sparkSession
    val path = s"$cacheRoot/${fingerprint(df)}"
    if (!graft.StoredArtifacts.ready(path)) {
      val tmp = path + "_tmp"
      graft.StoredArtifacts.deleteTree(tmp)
      df.write.mode("overwrite").parquet(tmp)
      graft.StoredArtifacts.deleteTree(path)
      if (!new java.io.File(tmp).renameTo(new java.io.File(path)))
        throw new java.io.IOException(s"cache commit failed: $tmp -> $path")
    }
    spark.read.parquet(path)
  }
}
