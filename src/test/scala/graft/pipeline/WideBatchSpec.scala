package graft.pipeline

import java.nio.file.Files
import java.time.Instant
import graft.SparkSpec

/** Width stress: a cycle over many runs across many plates — validates the
  * fan-out path (listing parallelism, bounded convert partitions, ledger
  * batch update) beyond the toy trees, and that MAX_MAP capping carries the
  * remainder to the next cycle.
  */
class WideBatchSpec extends SparkSpec {

  test("120 runs across 12 plates convert in one cycle; MAX_MAP caps carry over") {
    val root = Files.createTempDirectory("graft-wide")
    val watch = root.resolve("watch")
    for (p <- 1 to 12; r <- 1 to 10) {
      val d = watch.resolve(f"plate$p%02d").resolve(f"run$r%03d.d")
      Files.createDirectories(d)
      Files.writeString(d.resolve("raw.bin"), s"payload $p/$r")
    }
    val cfg = GraftConfig(
      watchDir = watch.toString,
      outputDir = root.resolve("out").toString,
      archiveDir = root.resolve("arch").toString,
      stateDir = root.resolve("state").toString,
      quietS = 0,
      maxMap = 100, // cap below the 120 discovered
      command = Seq("/bin/sh", "-c", """cat "$IN"/* > "$OUTDIR/$OUTFILE""""))

    val r1 = PipelineRunner.runCycle(spark, cfg, Instant.parse("2026-01-01T00:00:00Z"))
    assert(r1.discovered == 120 && r1.pending == 100, "MAX_MAP must cap the batch")
    assert(r1.stats.succeeded == 100 && r1.stats.failed == 0)

    val r2 = PipelineRunner.runCycle(spark, cfg, Instant.parse("2026-01-01T00:05:00Z"))
    assert(r2.pending == 20, "remainder picked up next cycle")
    assert(r2.stats.succeeded == 20)

    val ledger = new LedgerStore(spark, cfg.stateDir)
    assert(ledger.converted.count() == 120)

    val r3 = PipelineRunner.runCycle(spark, cfg, Instant.parse("2026-01-01T00:10:00Z"))
    assert(r3.pending == 0, "fully drained")
  }
}
