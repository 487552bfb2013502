package graft.streaming

import graft.{SparkSpec, Tables}
import graft.queries.Experiment
import org.apache.spark.sql.functions._

/** The continuous traffic-SRM guard: maintained per-type arm counts must
  * equal a one-shot recount over everything folded (count addition is
  * exact, so the maintained tier has NO approximation gap), a replayed
  * batch must be a no-op (counts are not replay-safe by algebra — the
  * manifest high-water protocol carries it), a fresh-checkpoint restart
  * must FAIL LOUDLY (r12 — silently skipping the renumbered batches
  * would drop never-folded events forever), and the guard's χ² must be
  * the x357 formula to the digit.
  */
class SrmMaintainSpec extends SparkSpec {

  private def recount(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.select(col("event_type"), Experiment.arm.as("arm"))
      .groupBy("event_type")
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("maintained counts are exact across batches; replay and restart are no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-srm").toString
    val e = Tables(spark, sf001, "events").select("user_id", "event_type")
    val batches = (0 until 3).map(i =>
      e.where(pmod(col("user_id"), lit(3)) === i))
    batches.zipWithIndex.foreach { case (b, i) =>
      SrmMaintainStream.maintain(spark, b, dir, i.toLong)
    }
    val truth = recount(e)
    val got = SrmMaintainStream.current(spark, dir).get.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == truth, "maintained tier must have zero approximation gap")
    // replayed live batch (same-checkpoint recovery re-delivers the LAST
    // batch): no fold
    SrmMaintainStream.maintain(spark, batches.last, dir, 2L)
    val after = SrmMaintainStream.current(spark, dir).get.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after == truth, "replay must not double any count")
    // fresh-checkpoint restart (batchId regresses below the live
    // generation): silently skipping would permanently DROP any events
    // that arrived after the last fold (r11 ADVICE — the renumbered
    // batch 0 re-lists every file); the guard must fail loudly and
    // demand a dir reset instead
    val ex = intercept[IllegalArgumentException] {
      SrmMaintainStream.maintain(spark, batches.head, dir, 0L)
    }
    assert(ex.getMessage.contains("fresh-checkpoint restart"))
    val intact = SrmMaintainStream.current(spark, dir).get.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(intact == truth, "failed fold must leave the live counts intact")
  }

  test("guard homogeneity arithmetic matches a BigInt replay; organic is clean") {
    val dir = java.nio.file.Files.createTempDirectory("graft-srm2").toString
    val e = Tables(spark, sf001, "events").select("user_id", "event_type")
    SrmMaintainStream.maintain(spark, e, dir, 0L)
    val rows = SrmMaintainStream.guard(spark, dir).collect()
    val poolA = rows.map(_.getAs[Long]("n_a")).sum
    val poolB = rows.map(_.getAs[Long]("n_b")).sum
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val dev = (BigInt(1000000) *
        (BigInt(na) * (poolA + poolB) - BigInt(poolA) * (na + nb)).abs /
        (BigInt(na + nb) * BigInt(poolA + poolB))).toLong
      assert(r.getAs[Long]("dev_ppm") == dev, s"dev at $r")
      assert(r.getAs[Boolean]("srm_flag") == (dev >= 50000L))
      // the same user split feeds every type, so organic types sit near
      // the pooled share — the reason the guard is a homogeneity check
      // (a per-type chi-square on clustered traffic cries wolf)
      assert(!r.getAs[Boolean]("srm_flag"), s"organic type flagged: $r")
    }
  }

  test("a planted imbalanced assignment trips the maintained guard") {
    // plant: a 'bugged' type whose events all land in arm 0 (the bug the
    // guard exists to catch), alongside the organic balanced traffic
    val dir = java.nio.file.Files.createTempDirectory("graft-srm3").toString
    import spark.implicits._
    val organic = Tables(spark, sf001, "events").select("user_id", "event_type")
    // md5-parity arm 0 users only, emitting a synthetic type
    val armOf = organic.select(col("user_id"), Experiment.arm.as("arm"))
      .where(col("arm") === 0L).select("user_id").distinct()
      .withColumn("event_type", lit("bugged"))
    SrmMaintainStream.maintain(spark, organic.unionByName(armOf), dir, 0L)
    val g = SrmMaintainStream.guard(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("srm_flag")).toMap
    assert(g("bugged"), "all-one-arm traffic must flag")
    assert(g.exists(!_._2), "organic balanced types must not all flag")
  }

  test("streaming entry point folds file batches through the same maintain()") {
    val dir = java.nio.file.Files.createTempDirectory("graft-srm4").toString
    val src = java.nio.file.Files.createTempDirectory("graft-srm-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-srm-ck").toString
    val e = Tables(spark, sf001, "events").select("user_id", "event_type")
    e.coalesce(1).write.mode("append").parquet(src)
    val q = SrmMaintainStream.start(spark, src, dir, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(120000)
    val got = SrmMaintainStream.current(spark, dir).get.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == recount(e), "stream-folded counts equal the recount")
  }
}
