package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.{SparkSpec, StoredManifest}
import graft.queries.Events
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Gates for incremental HLL sketch maintenance: maintained registers are
  * bit-identical to a full rebuild after every fold, replayed input is a
  * semantic no-op (max-merge idempotence — stronger than the MV summary's
  * order-independence), and serving estimates come from the live
  * generation alone.
  */
class StreamingSketchSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def batch1 = Seq(
    (ts("2026-02-01 08:00:00"), "view", 1.0, 11L),
    (ts("2026-02-01 09:00:00"), "view", 1.0, 12L),
    (ts("2026-02-01 10:00:00"), "click", 1.0, 13L),
    (ts("2026-02-02 08:00:00"), "view", 1.0, 11L))

  private def batch2 = Seq(
    (ts("2026-02-01 23:00:00"), "view", 1.0, 14L), // same day, new user
    (ts("2026-02-02 01:00:00"), "view", 1.0, 11L), // repeat user
    (ts("2026-02-03 01:00:00"), "view", 1.0, 99L)) // new day

  private def df(rows: Seq[(Timestamp, String, Double, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("ts", "event_type", "value", "user_id")
  }

  private def sketchSet(d: DataFrame) =
    d.collect().map(_.toSeq).toSet

  test("incremental folds match full rebuilds; replay is a no-op; serving works") {
    val root = Files.createTempDirectory("graft-sketch")
    val dir = root.resolve("sk").toString
    try {
      SketchMaintainStream.maintain(spark, df(batch1), dir, 0L)
      val afterB1 = sketchSet(SketchMaintainStream.current(spark, dir).get)
      assert(afterB1 == sketchSet(Events.hllDailySketch(df(batch1))),
        "bootstrap sketch != direct sketch of batch 1")

      SketchMaintainStream.maintain(spark, df(batch2), dir, 1L)
      val afterB2 = sketchSet(SketchMaintainStream.current(spark, dir).get)
      val full = sketchSet(Events.hllDailySketch(df(batch1 ++ batch2)))
      assert(afterB2 == full, "incremental fold != full rebuild")

      // idempotence: replaying batch2 wholesale under a NEW batch id (the
      // at-least-once duplication case a ledger-less pipeline can see)
      // changes nothing — max-merge absorbs duplicates semantically
      SketchMaintainStream.maintain(spark, df(batch2), dir, 2L)
      assert(sketchSet(SketchMaintainStream.current(spark, dir).get) == full,
        "replayed rows changed the sketch")
      // ... while re-delivery of the LIVE batch id doesn't even write
      SketchMaintainStream.maintain(spark, df(batch2), dir, 2L)
      assert(StoredManifest.read(dir)._1 == "gen_2")

      // serving: estimates off the maintained generation equal estimates
      // off a fresh full sketch, bit for bit
      val served = sketchSet(SketchMaintainStream.estimates(spark, dir))
      val direct = sketchSet(Events.hllEstimate(
        Events.hllDailySketch(df(batch1 ++ batch2)), Seq("day"))
        .select("day", "est_n"))
      assert(served == direct)
      // and the feb-1 estimate sees all four distinct users (11,12,13,14),
      // exactly — the linear-counting regime is error-free this small
      val feb1 = SketchMaintainStream.estimates(spark, dir)
        .where(org.apache.spark.sql.functions.col("day") ===
          ts("2026-02-01 00:00:00")).head().getLong(1)
      assert(feb1 == 4L, s"feb1 estimate $feb1 (exact 4, tiny-range regime)")
    } finally graft.StoredArtifacts.deleteTree(root.toString)
  }
}
