package graft.pipeline

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Dataset

/** The external-process transform — operator A13 (dags/msconvert_dag.py:
  * 249-343), the reference's per-run `msconvert` invocation reduced to its
  * portable contract: run a command with env {IN, BASE, STEM, OUTFILE,
  * PLATE_REL, OUTDIR}; success = exit code 0 AND the expected output file
  * exists. (Wine-prefix seeding and Docker mounts are site mechanics, not
  * semantics — SURVEY.md §2.A13.)
  *
  * Parallelism is bounded to `poolSlots` partitions (the reference's Airflow
  * pool of 4, docker-compose.yml:74) via coalesce — each partition runs its
  * rows sequentially, so at most `poolSlots` subprocesses exist at once,
  * cluster-wide the same contract as the pool. A10 (skip-on-missing) runs at
  * stage entry: a run dir that vanished between discovery and processing is
  * counted `skipped`, never `failed` (:226-228).
  */
object ExternalProcess {

  /** Substitute {TOKEN} placeholders and export the env contract. */
  private[pipeline] def render(template: Seq[String], env: RunEnv): Seq[String] = {
    val subs = Map(
      "{IN}" -> env.in, "{BASE}" -> env.base, "{STEM}" -> env.stem,
      "{OUTFILE}" -> env.outfile, "{PLATE_REL}" -> env.plateRel,
      "{OUTDIR}" -> env.outdir)
    template.map(arg => subs.foldLeft(arg) { case (a, (k, v)) => a.replace(k, v) })
  }

  def convert(envs: Dataset[RunEnv], cfg: GraftConfig): Dataset[RunStatus] = {
    val spark = envs.sparkSession
    import spark.implicits._
    envs
      .coalesce(math.max(1, cfg.poolSlots)) // A17 concurrency governor
      .mapPartitions(_.map(e => runOne(e, cfg)))
  }

  private def runOne(e: RunEnv, cfg: GraftConfig): RunStatus = {
    val start = new Timestamp(System.currentTimeMillis())
    def done(state: String, msg: String, archived: Boolean = false) =
      RunStatus(e.base, e.plateRel, e.in, e.outfile, state, msg,
        start, new Timestamp(System.currentTimeMillis()), archived)

    // A10: input vanished since discovery → skip, not fail
    if (!Files.isDirectory(Paths.get(e.in)))
      return done("skipped", s"input disappeared: ${e.in}")

    try {
      val outdir = Paths.get(e.outdir)
      Files.createDirectories(outdir)
      // write-test before the expensive conversion (:316-321)
      val probe = outdir.resolve(s".write_test_${e.stem}")
      try { Files.writeString(probe, "ok"); Files.delete(probe) }
      catch {
        case ex: java.io.IOException =>
          return done("failed", s"outdir not writable: ${ex.getMessage}")
      }

      val cmd = render(cfg.command, e)
      if (cmd.isEmpty) return done("failed", "no command configured")
      val pb = new ProcessBuilder(cmd.asJava)
      pb.environment().putAll(Map(
        "IN" -> e.in, "BASE" -> e.base, "STEM" -> e.stem,
        "OUTFILE" -> e.outfile, "PLATE_REL" -> e.plateRel,
        "OUTDIR" -> e.outdir).asJava)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val output = new String(proc.getInputStream.readAllBytes())
      val rc = proc.waitFor()

      val expected = outdir.resolve(e.outfile)
      if (rc != 0)
        done("failed", s"rc=$rc: ${output.takeRight(500)}")
      else if (!Files.exists(expected))
        done("failed", s"rc=0 but expected output missing: $expected")
      else
        done("success", "")
    } catch {
      case ex: Exception => done("failed", s"${ex.getClass.getSimpleName}: ${ex.getMessage}")
    }
  }
}
