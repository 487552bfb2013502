package graft.pipeline

import java.time.Instant
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-logic specs for the pipeline primitives (no SparkSession).
  * Property tests run scalacheck directly (scalatestplus bridge not in the
  * offline cache).
  */
class QuiescenceSpec extends AnyFunSuite {
  import Quiescence._

  private def holds(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("first observation is never ready when quietS > 0") {
    holds(Prop.forAll(Gen.long, Gen.posNum[Long]) { (size, now) =>
      !advance(None, size, now, quietS = 120).ready
    })
  }

  test("unchanged size becomes ready exactly at the quiet window") {
    val d0 = advance(None, 100, 1000, 120)
    assert(!advance(Some(d0.state), 100, 1119, 120).ready)
    assert(advance(Some(d0.state), 100, 1120, 120).ready)
  }

  test("any size change restarts the clock") {
    holds(Prop.forAll(Gen.long, Gen.long) { (s1, s2) =>
      s1 == s2 || {
        val d0 = advance(None, s1, 1000, 120)
        val d1 = advance(Some(d0.state), s2, 1500, 120)
        !d1.ready && d1.state.stableSinceEpochS == 1500
      }
    })
  }

  test("quietS=0 is always immediately ready") {
    holds(Prop.forAll(Gen.long) { size => advance(None, size, 42, 0).ready })
  }
}

class VerifyGateSpec extends AnyFunSuite {
  import VerifyGate._

  test("empty batch passes") { check(BatchStats(0, 0, 0), 10) }

  test("all-failed batch throws even under threshold") {
    // reference: failed == total is a hard fail regardless of threshold
    intercept[BatchFailedException] { check(BatchStats(2, 2, 0), 10) }
  }

  test("threshold clamps to total (min(FAIL_THRESHOLD, total))") {
    // total=5 < threshold=10: clamp means >5 failures impossible, but
    // failed=5 == total triggers all-failed; failed=4 <= 5 passes
    check(BatchStats(5, 4, 0), 10)
    intercept[BatchFailedException] { check(BatchStats(20, 11, 0), 10) }
    check(BatchStats(20, 10, 0), 10)
  }

  test("skips are excluded from failure counting") {
    check(BatchStats(12, 0, 12), 10) // all skipped: fine
    assert(BatchStats(10, 3, 4).succeeded == 3)
  }
}

class ConfigAndNamingSpec extends AnyFunSuite {
  test("bool parsing matches the reference quirk: only 1/true/True") {
    assert(GraftConfig.parseBool("1"))
    assert(GraftConfig.parseBool("true"))
    assert(GraftConfig.parseBool("True"))
    assert(!GraftConfig.parseBool("TRUE"))
    assert(!GraftConfig.parseBool("yes"))
    assert(!GraftConfig.parseBool("0"))
    assert(!GraftConfig.parseBool(""))
  }

  test("PRIVILEGED-style bool is case-insensitive and accepts yes") {
    for (s <- Seq("1", "true", "True", "TRUE", "yes", "Yes", "YES"))
      assert(GraftConfig.parseBoolPrivileged(s), s)
    for (s <- Seq("0", "no", "", "y", "on"))
      assert(!GraftConfig.parseBoolPrivileged(s), s)
  }

  test("invalid format/policy rejected") {
    intercept[IllegalArgumentException] {
      GraftConfig("w", "o", "a", "s", format = "wiff")
    }
    intercept[IllegalArgumentException] {
      GraftConfig("w", "o", "a", "s", archivePolicy = "append")
    }
  }

  test("naming: timestamped stem and extension selection") {
    val now = Instant.parse("2026-04-17T12:34:56Z")
    assert(Naming.outfileStem("run1", now) == "run1-20260417T123456Z")
    val base = GraftConfig("w", "o", "a", "s")
    assert(Naming.outfileName("x", base) == "x.mzML")
    assert(Naming.outfileName("x", base.copy(format = "mzxml")) == "x.mzXML")
    assert(Naming.outfileName("x", base.copy(gzipOut = true)) == "x.mzML.gz")
  }

  test("runEnv carries the 6-field XCom contract") {
    val cfg = GraftConfig("/w", "/out", "/arch", "/state")
    val e = Naming.runEnv(RunRecord("/w/p1/r1.d", "p1", "r1"), cfg,
      Instant.parse("2026-01-01T00:00:00Z"))
    assert(e == RunEnv("/w/p1/r1.d", "r1", "r1-20260101T000000Z",
      "r1-20260101T000000Z.mzML", "p1", "/out/p1"))
  }

  test("command template token substitution") {
    val e = RunEnv("/in/x.d", "x", "x-1", "x-1.mzML", "p", "/out/p")
    val got = ExternalProcess.render(Seq("conv", "--in={IN}", "--o={OUTDIR}/{OUTFILE}"), e)
    assert(got == Seq("conv", "--in=/in/x.d", "--o=/out/p/x-1.mzML"))
  }
}
