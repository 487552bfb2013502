package graft.plans

import org.apache.spark.sql.DataFrame

/** Plan-fingerprint result cache — serve a repeated deterministic query
  * from its materialized result instead of recomputing (the dashboard /
  * scheduled-report accelerator: the reference's Grafana panels re-issue
  * the same five rollups on every refresh).
  *
  * The cache key is an md5 of the canonicalized optimized plan (see
  * [[fingerprint]] for why it deliberately differs from the bench's
  * `plans_r<N>.json` hash), so the key covers the full query SHAPE
  * including literals and column references: a changed filter constant,
  * column set, or source path re-keys, while expression-id churn does
  * not (canonicalization normalizes exprIds to ordinals). Correctness
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

  /** Cache key: md5 of the canonicalized optimized plan, UN-stripped —
    * deliberately not [[graft.Bench.planFingerprint]]. The bench artifact
    * erases `#<exprId>` ordinals to stay stable across rounds, but after
    * canonicalization renames every attribute to `none` those ordinals
    * are the ONLY token distinguishing same-typed columns — stripping
    * them would let `where(a < 5)` and `where(b < 5)` collide and a hit
    * serve the wrong query's rows. Canonicalized exprIds are normalized
    * ordinals (deterministic per plan shape), so keeping them costs no
    * stability for deterministic plans; a plan embedding genuinely
    * session-local tokens (e.g. a localCheckpoint RDD id) re-keys and
    * misses — the safe direction for a cache.
    */
  def fingerprint(df: DataFrame): String = {
    val canon = df.queryExecution.optimizedPlan.canonicalized.toString
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
  }

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
