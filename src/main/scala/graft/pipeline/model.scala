package graft.pipeline

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

/** Core pipeline records (reference data model: SURVEY.md §1.1).
  *
  * `RunRecord` = one discovered unit of work (a `*.d` run directory,
  * dags/msconvert_dag.py:203-210); `RunEnv` = the 6-field task payload the
  * reference passes between stages via XCom (:236-243); `RunStatus` = the
  * per-row outcome the verify gate and run-history analytics consume
  * (:441-474, grafana msconvert.json).
  */
final case class RunRecord(path: String, plateRel: String, base: String)

final case class RunEnv(
    in: String,
    base: String,
    stem: String,
    outfile: String,
    plateRel: String,
    outdir: String)

/** state ∈ {success, failed, skipped}; mirrors Airflow task states the
  * reference's dashboards and verify gate count over.
  *
  * `origBytes`/`archiveBytes` are the source-dir vs committed-tar sizes the
  * reference logs per archive (src_bytes/arc_size + saved %,
  * dags/msconvert_dag.py:400-424); 0 until a run is archived.
  */
final case class RunStatus(
    base: String,
    plateRel: String,
    in: String,
    outfile: String,
    state: String,
    message: String,
    startTs: java.sql.Timestamp,
    endTs: java.sql.Timestamp,
    archived: Boolean,
    origBytes: Long = 0L,
    archiveBytes: Long = 0L)

object Naming {
  private val fmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)

  /** UTC timestamp stem suffix — dags/msconvert_dag.py:73-74. */
  def tsUtc(now: Instant): String = fmt.format(now)

  /** `{base}-{ts}` — dags/msconvert_dag.py:126-127. Timestamped stems make
    * re-conversion collision-free, the reference's idempotency half of
    * exactly-once (SURVEY.md §4).
    */
  def outfileStem(base: String, now: Instant): String = s"$base-${tsUtc(now)}"

  /** Output extension from config — dags/msconvert_dag.py:230-233. */
  def outfileName(stem: String, cfg: GraftConfig): String = {
    val ext = if (cfg.format == "mzxml") "mzXML" else "mzML"
    val gz = if (cfg.gzipOut) ".gz" else ""
    s"$stem.$ext$gz"
  }

  def runEnv(r: RunRecord, cfg: GraftConfig, now: Instant): RunEnv = {
    val stem = outfileStem(r.base, now)
    RunEnv(
      in = r.path,
      base = r.base,
      stem = stem,
      outfile = outfileName(stem, cfg),
      plateRel = r.plateRel,
      outdir = if (r.plateRel.isEmpty) cfg.outputDir else s"${cfg.outputDir}/${r.plateRel}")
  }
}
