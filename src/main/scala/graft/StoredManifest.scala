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

  /** Atomically publish (generation, segments). */
  def write(dir: String, gen: String, segments: Seq[String]): Unit = {
    require(gen.nonEmpty && !gen.contains(",") && !gen.contains("|"),
      s"generation name must be non-empty and ','/'|'-free: '$gen'")
    require(segments.nonEmpty &&
        segments.forall(s => s.nonEmpty && !s.contains(",") && !s.contains("|")),
      s"segment names must be non-empty and ','/'|'-free: $segments")
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, "MANIFEST.tmp")
    Files.write(tmp, s"$gen|${segments.mkString(",")}".getBytes("UTF-8"))
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

  def exists(dir: String): Boolean = Files.exists(manifestPath(dir))

  /** Delete generation directories (by `prefix`) the manifest does NOT
    * name — garbage from interrupted or superseded publishes, unreachable
    * by construction. Callers choose WHEN: sweeping at the start of the
    * next publish (rather than right after a flip) leaves the previous
    * generation on disk through one full cycle, so a reader that resolved
    * the manifest just before a flip can still finish its read.
    */
  def sweepUnreachable(dir: String, prefix: String = "gen_"): Unit = {
    import scala.jdk.CollectionConverters._
    if (!exists(dir)) return
    val (live, _) = read(dir)
    val root = Paths.get(dir)
    if (Files.isDirectory(root))
      Files.list(root).iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.startsWith(prefix) &&
          p.getFileName.toString != live)
        .foreach(p => StoredArtifacts.deleteTree(p.toString))
  }
}
