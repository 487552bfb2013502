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

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Artifact directory for (source dataset dir, artifact name). The key is
    * `<pathHash>_<stateHash>`: the state half hashes every top-level entry's
    * (name, size, file mtime) — FILE mtimes, because a fixture regenerated
    * by truncate+overwrite changes no directory mtime and no entry name —
    * so any regeneration re-keys and the old index is never served against
    * vanished data (a re-build is re-paid once — cheap; a stale index is
    * silently wrong). The path half is stable per source dir, which lets
    * [[dir]] SWEEP superseded generations of the same source on each call:
    * disk holds at most one artifact generation per fixture. Builder-CODE
    * changes are still the `_vN` suffix's job: bump it whenever the
    * artifact format or training behavior changes.
    */
  def dir(sfDir: String, name: String): String = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(sfDir)
    val state =
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).iterator().asScala.toSeq.sortBy(_.toString)
          .map(f => s"${f.getFileName}:${java.nio.file.Files.size(f)}:" +
            s"${java.nio.file.Files.getLastModifiedTime(f).toMillis}")
          .mkString("|")
      else "absent"
    val pathKey = md5(sfDir).take(8)
    val stateKey = md5(state).take(8)
    val root = java.nio.file.Paths.get(s"${sys.props("java.io.tmpdir")}/graft_artifacts")
    val current = s"${pathKey}_$stateKey"
    // sweep superseded generations of THIS source (same path hash, other
    // state). HARD single-JVM assumption: there is no cross-process
    // coordination, so a concurrent JVM on the same fixtures could have a
    // swept generation mid-read (observed failure mode: missing-file
    // errors in the reader). The harness runs one JVM (SKILL.md states
    // the constraint as correctness, not timing); a shared deployment
    // would gate this sweep behind a manifest/lease, as AnnManifest does
    // for the IVF index proper.
    if (java.nio.file.Files.isDirectory(root))
      java.nio.file.Files.list(root).iterator().asScala.toSeq
        .filter { d =>
          val n = d.getFileName.toString
          n.startsWith(s"${pathKey}_") && n != current
        }
        .foreach(d => deleteTree(d.toString))
    s"$root/$current/$name"
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
