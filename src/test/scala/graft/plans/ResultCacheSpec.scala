package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-fingerprint result cache: a hit serves the materialized result
  * (scan leaves = cache files, zero source scans), keys distinguish
  * literal changes, and hit results are bit-identical to the computation.
  */
class ResultCacheSpec extends SparkSpec {

  private def root: String =
    graft.StoredArtifacts.dir(sf001, "result_cache_spec_v1")

  private def query(maxKey: Int) =
    graft.Tables(spark, sf001, "orders")
      .where(col("o_custkey") < maxKey)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("spend"))
      .orderBy("o_orderstatus")

  test("miss computes once; hit reads only the cache, bit-identical") {
    val direct = query(500).collect()
    val first = ResultCache.run(query(500), root).collect()
    assert(first.toSeq == direct.toSeq)

    val hit = ResultCache.run(query(500), root)
    val leaves = hit.queryExecution.optimizedPlan.collectLeaves()
    val scanned = leaves.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten
    assert(scanned.nonEmpty && scanned.forall(_.contains("result_cache_spec_v1")),
      s"a hit must read the cache, not the source tables: $scanned")
    assert(hit.collect().toSeq == direct.toSeq)
  }

  test("a changed literal re-keys instead of serving the wrong cache entry") {
    val fpA = ResultCache.fingerprint(query(500))
    val fpB = ResultCache.fingerprint(query(200))
    assert(fpA != fpB, "filter literals must be part of the key")
    val b = ResultCache.run(query(200), root).collect()
    assert(b.toSeq == query(200).collect().toSeq)
  }

  test("fingerprints are stable across independent constructions of the same query") {
    assert(ResultCache.fingerprint(query(500)) == ResultCache.fingerprint(query(500)))
  }

  test("same-typed different columns re-key (the stripped-ordinal collision)") {
    // after canonicalization renames attributes, exprId ordinals are the
    // only distinguishing token between same-typed columns — the cache
    // key must keep them (the bench drift hash strips them)
    val byCust = graft.Tables(spark, sf001, "orders")
      .where(col("o_custkey") < 500).select(col("o_orderkey"))
    val byKey = graft.Tables(spark, sf001, "orders")
      .where(col("o_orderkey") < 500).select(col("o_orderkey"))
    assert(ResultCache.fingerprint(byCust) != ResultCache.fingerprint(byKey),
      "queries differing only in the referenced column must not collide")
  }
}
