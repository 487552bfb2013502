package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** The atomic pointer-file commit shared by every generation-directory
  * artifact (the IVF index's [[graft.queries.AnnManifest]], the streaming
  * dashboard's published panels): immutable generation directories plus one
  * `MANIFEST` file naming the live generation and its segment list,
  * replaced atomically (write `MANIFEST.tmp`, `ATOMIC_MOVE` over
  * `MANIFEST`). A reader resolving through the manifest sees one complete
  * generation at every instant; writers publish only after their
  * generation is fully on disk. Single WRITER assumed (two concurrent
  * publishers would race the pointer); on a cluster the same protocol is
  * an atomically-replaced object — rename on HDFS, put-if-match on S3,
  * the Iceberg/Delta-style table commit.
  */
object StoredManifest {

  private def manifestPath(dir: String) = Paths.get(dir, "MANIFEST")

  private def snapshotPath(dir: String, gen: String) =
    Paths.get(dir, s"MANIFEST.$gen")

  private def pinPath(dir: String, gen: String) = Paths.get(dir, s"PIN.$gen")

  /** Atomically publish (generation, segments). Each publish also
    * refreshes the generation's SNAPSHOT file (`MANIFEST.<gen>`, same
    * atomic replace) — the per-generation segment record that makes
    * [[readGen]]/[[rollback]] possible after the live pointer moves on.
    */
  def write(dir: String, gen: String, segments: Seq[String]): Unit = {
    require(gen.nonEmpty && !gen.contains(",") && !gen.contains("|"),
      s"generation name must be non-empty and ','/'|'-free: '$gen'")
    require(segments.nonEmpty &&
        segments.forall(s => s.nonEmpty && !s.contains(",") && !s.contains("|")),
      s"segment names must be non-empty and ','/'|'-free: $segments")
    Files.createDirectories(Paths.get(dir))
    val line = s"$gen|${segments.mkString(",")}".getBytes("UTF-8")
    val snapTmp = Paths.get(dir, s"MANIFEST.$gen.tmp")
    Files.write(snapTmp, line)
    Files.move(snapTmp, snapshotPath(dir, gen),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val tmp = Paths.get(dir, "MANIFEST.tmp")
    Files.write(tmp, line)
    Files.move(tmp, manifestPath(dir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The live (generation, segments) — what every read path resolves. */
  def read(dir: String): (String, Seq[String]) = {
    val line = new String(Files.readAllBytes(manifestPath(dir)), "UTF-8").trim
    line.split('|') match {
      case Array(gen, segs) => (gen, segs.split(',').toSeq)
      case _ => throw new IllegalStateException(
        s"malformed MANIFEST under $dir: '$line'")
    }
  }

  /** TIME-TRAVEL read: resolve a specific generation's segment list from
    * its snapshot, regardless of where the live pointer is — the
    * Iceberg/Delta `VERSION AS OF` shape. The generation's data outlives
    * the live pointer for one compaction cycle by the sweep schedule;
    * [[pin]] extends that indefinitely.
    */
  def readGen(dir: String, gen: String): (String, Seq[String]) = {
    val p = snapshotPath(dir, gen)
    require(Files.exists(p),
      s"no snapshot for generation '$gen' under $dir — " +
        "it predates the snapshot protocol or never committed")
    val line = new String(Files.readAllBytes(p), "UTF-8").trim
    line.split('|') match {
      case Array(g, segs) => (g, segs.split(',').toSeq)
      case _ => throw new IllegalStateException(
        s"malformed snapshot for $gen under $dir: '$line'")
    }
  }

  def exists(dir: String): Boolean = Files.exists(manifestPath(dir))

  /** Pin a generation: its directory becomes sweep-exempt until [[unpin]],
    * so a reader can keep serving a historical snapshot while compactions
    * advance the live pointer (the Iceberg snapshot-retention contract in
    * marker-file form). Requires the generation to still be resolvable.
    */
  def pin(dir: String, gen: String): Unit = {
    readGen(dir, gen) // fails fast if the snapshot is gone
    require(Files.isDirectory(Paths.get(dir, gen)),
      s"generation directory '$gen' no longer on disk under $dir — " +
        "pin before the sweep, not after")
    Files.write(pinPath(dir, gen), Array.emptyByteArray)
  }

  def unpin(dir: String, gen: String): Unit =
    Files.deleteIfExists(pinPath(dir, gen))

  def isPinned(dir: String, gen: String): Boolean =
    Files.exists(pinPath(dir, gen))

  /** ROLLBACK after a bad publish: re-point the live manifest at a prior
    * generation exactly as its snapshot recorded it. One atomic pointer
    * flip — the superseded (bad) generation becomes unreachable and the
    * next sweep collects it; readers mid-flight keep their own snapshot
    * semantics throughout.
    */
  def rollback(dir: String, gen: String): Unit = {
    val (_, segments) = readGen(dir, gen)
    require(Files.isDirectory(Paths.get(dir, gen)),
      s"cannot roll back to '$gen' under $dir: generation directory " +
        "already swept (pin generations you may need to return to)")
    write(dir, gen, segments)
  }

  /** Delete generation directories (by `prefix`) the manifest does NOT
    * name — garbage from interrupted or superseded publishes, unreachable
    * by construction — EXCEPT pinned generations ([[pin]]). A swept
    * generation's snapshot and pin marker are removed with it. Callers
    * choose WHEN: sweeping at the start of the next publish (rather than
    * right after a flip) leaves the previous generation on disk through
    * one full cycle, so a reader that resolved the manifest just before a
    * flip can still finish its read.
    */
  def sweepUnreachable(dir: String, prefix: String = "gen_"): Unit = {
    import scala.jdk.CollectionConverters._
    if (!exists(dir)) return
    val (live, _) = read(dir)
    val root = Paths.get(dir)
    if (Files.isDirectory(root))
      Files.list(root).iterator().asScala.toSeq
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith(prefix) &&
          p.getFileName.toString != live &&
          !isPinned(dir, p.getFileName.toString))
        .foreach { p =>
          val gen = p.getFileName.toString
          StoredArtifacts.deleteTree(p.toString)
          Files.deleteIfExists(snapshotPath(dir, gen))
          Files.deleteIfExists(pinPath(dir, gen))
        }
  }
}
