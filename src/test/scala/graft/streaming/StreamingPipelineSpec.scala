package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import graft.SparkSpec
import graft.pipeline.{GraftConfig, LedgerStore}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end streaming pipeline: observation stream → debounce →
  * foreachBatch convert → ledger — with replay idempotency.
  */
class StreamingPipelineSpec extends SparkSpec {

  test("stream of observations converts ready runs exactly once") {
    implicit val sc = spark.sqlContext
    import spark.implicits._

    val root = Files.createTempDirectory("graft-sspipe")
    val watch = root.resolve("watch")
    val runA = watch.resolve("p1").resolve("runA.d")
    Files.createDirectories(runA)
    Files.writeString(runA.resolve("raw.bin"), "streaming payload")
    val cfg = GraftConfig(
      watchDir = watch.toString,
      outputDir = root.resolve("out").toString,
      archiveDir = root.resolve("arch").toString,
      stateDir = root.resolve("state").toString,
      command = Seq("/bin/sh", "-c", """cat "$IN"/* > "$OUTDIR/$OUTFILE""""))

    val input = MemoryStream[DebounceStream.SizeObservation]
    // observation clocks must be wall-aligned: the debounce state machine
    // also has a processing-time timeout path, and epoch-0 event times would
    // look "stable for decades" to it
    val base = System.currentTimeMillis()
    def ts(s: Long) = new Timestamp(base + s * 1000)
    // phased AvailableNow runs restarting from one checkpoint: each phase
    // drains available observations then terminates (a continuous-trigger
    // query + processAllAvailable never settles — the processing-time
    // timeouts keep scheduling state work), and the restarts double as
    // recovery-from-checkpoint coverage.
    def runPhase(): Unit = {
      // replay mode (no wall-clock timeout): readiness advances on the
      // observations' event times only, so phases are deterministic
      val q = StreamingPipeline.build(input.toDS(), cfg, quietS = 60,
          wallClockTimeout = false)
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      q.stop()
    }

    // phase 1: clock starts, nothing ready
    input.addData(DebounceStream.SizeObservation(runA.toString, 17, ts(0)))
    runPhase()
    val ledger = new LedgerStore(spark, cfg.stateDir)
    assert(ledger.converted.count() == 0, "quiet window not elapsed yet")

    // phase 2: 70s later, same size => ready => micro-batch converts it
    input.addData(DebounceStream.SizeObservation(runA.toString, 17, ts(70)))
    runPhase()
    assert(ledger.converted.count() == 1, "ready run must convert")
    val outDir = Paths.get(cfg.outputDir, "p1")
    val outs1 = Files.list(outDir).count()
    assert(outs1 == 1)

    // phase 3: the same path becomes ready again (size changed + re-stable):
    // ledger anti-join keeps conversion exactly-once
    input.addData(DebounceStream.SizeObservation(runA.toString, 18, ts(200)))
    runPhase()
    input.addData(DebounceStream.SizeObservation(runA.toString, 18, ts(270)))
    runPhase()

    assert(ledger.converted.count() == 1, "ledger anti-join must drop re-ready run")
    assert(Files.list(outDir).count() == outs1, "no duplicate outputs")
  }
}
