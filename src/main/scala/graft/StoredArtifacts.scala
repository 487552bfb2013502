package graft

/** Locations for DERIVED stored artifacts — indexes, learned vocabularies,
  * centroid tables — keyed by the source dataset directory: the
  * build-once / probe-many serving layout (the posting-index and bigram-LM
  * stored paths demonstrated in StoredIndexSpec, promoted to a shared
  * convention for registry queries).
  *
  * Registry entries that read a stored artifact (x62 IVF, x63 BPE) build it
  * on first touch and then only READ it — so a repeated Verify/Bench run
  * measures the serving path, exactly as production would (the index is an
  * ingest-time cost, amortized over every query). The key hashes the source
  * dir, so sf0.01 and sf0.1 never share an artifact; a `_vN` suffix in the
  * artifact name versions the format. Paths live under java.io.tmpdir on
  * this single-JVM harness; on a cluster the same layout lands on shared
  * storage — nothing below assumes a local filesystem except [[ready]],
  * which checks the parquet committer's `_SUCCESS` marker.
  */
object StoredArtifacts {

  /** Artifact directory for (source dataset dir, artifact name). */
  def dir(sfDir: String, name: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_artifacts/$key/$name"
  }

  /** True iff a parquet write to `path` COMPLETED (committer `_SUCCESS`
    * marker present) — a crashed half-write rebuilds instead of serving
    * partial data.
    */
  def ready(path: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))
}
