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

  /** Artifact directory for (source dataset dir, artifact name). The key
    * hashes the source PATH plus its last-modified time, so regenerating a
    * fixture in place orphans the old artifacts instead of serving indexes
    * trained on vanished data (an orphaned build is re-paid once — cheap;
    * a stale index is silently wrong). Builder-CODE changes are still the
    * `_vN` suffix's job: bump it whenever the artifact format or training
    * behavior changes.
    */
  def dir(sfDir: String, name: String): String = {
    val p = java.nio.file.Paths.get(sfDir)
    val mtime =
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.getLastModifiedTime(p).toMillis.toString
      else "absent"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir@$mtime".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_artifacts/$key/$name"
  }

  /** True iff a parquet write to `path` COMPLETED (committer `_SUCCESS`
    * marker present) — a crashed half-write rebuilds instead of serving
    * partial data.
    */
  def ready(path: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))

  /** Recursively delete a directory tree (no-op if absent). */
  def deleteTree(path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
  }
}
