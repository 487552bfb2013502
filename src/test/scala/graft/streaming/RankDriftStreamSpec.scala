package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The x249 numeric drift monitor wired to arriving data: each landed
  * file re-publishes the Mann–Whitney verdict of data-so-far vs the
  * frozen reference, manifest-committed and row-identical to the batch
  * operator on the same files.
  */
class RankDriftStreamSpec extends SparkSpec {

  /** A value sample with 2-decimal values around `center` — the centi
    * quantization the operator uses is exact on these.
    */
  private def sample(center: Double, n: Int, idBase: Long) =
    (0 until n).map(i => (idBase + i, center + (i % 7) - 3 + 0.25))

  private def writeFile(dir: String, name: String,
      rows: Seq[(Long, Double)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-rankdrift").toString
    rows.toDF("event_id", "value").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    import scala.jdk.CollectionConverters._
    val found = Files.list(java.nio.file.Paths.get(tmp)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(fail(s"no part file under $tmp"))
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.move(found, java.nio.file.Paths.get(dir, s"$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    graft.StoredArtifacts.deleteTree(tmp)
  }

  private def runOnce(arrivalsDir: String, refDir: String, stateDir: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val q = RankDriftStream.start(spark, arrivalsDir, refDir, stateDir,
      alarmMicro = 450000L, schema = schema,
      trigger = Trigger.AvailableNow(), pathGlobFilter = "*.parquet")
    q.awaitTermination(60000)
    assert(!q.isActive, "AvailableNow refresh must drain and stop")
  }

  test("arriving files publish the rank-drift verdict, alarming on a value shift") {
    val root = Files.createTempDirectory("graft-rankdriftstream")
    val arrivals = root.resolve("arrivals").toString
    val refDir = root.resolve("reference").toString
    val stateDir = root.resolve("state").toString
    try {
      writeFile(refDir, "ref", sample(center = 50.0, n = 60, idBase = 0L))
      // batch 1: same regime as the reference -> no alarm
      writeFile(arrivals, "b1", sample(center = 50.0, n = 40, idBase = 1000L))
      val schema = spark.read.parquet(arrivals).schema
      runOnce(arrivals, refDir, stateDir, schema)

      assert(RankDriftStream.published(stateDir), "first refresh publishes")
      val gen1 = RankDriftStream.liveGeneration(stateDir)
      val v1 = RankDriftStream.read(spark, stateDir).head()
      assert(v1.getAs[Long]("n_cur") == 40L && v1.getAs[Long]("n_ref") == 60L)
      assert(!v1.getAs[Boolean]("drifted"),
        s"same-regime batch must not alarm: $v1")

      // batch 2: the value scale shifts far above the reference -> alarm
      writeFile(arrivals, "b2", sample(center = 250.0, n = 40, idBase = 2000L))
      runOnce(arrivals, refDir, stateDir, schema)
      assert(RankDriftStream.liveGeneration(stateDir) != gen1)
      val v2 = RankDriftStream.read(spark, stateDir).head()
      assert(v2.getAs[Long]("n_cur") == 80L)
      assert(v2.getAs[Boolean]("drifted"),
        s"shifted values must raise the alarm: $v2")
      assert(v2.getAs[Long]("rb_micro") > 0L,
        "shift upward means current stochastically dominates the reference")

      // two paths, one result: every published report segment equals its
      // batch operator over the same files
      val curDf = spark.read.parquet(arrivals)
      val refDf = spark.read.parquet(refDir)
      val direct = graft.queries.Events.valueRankDrift(
        curDf, refDf, alarmMicro = 450000L).head()
      assert(RankDriftStream.read(spark, stateDir).head().toSeq
        == direct.toSeq, "published verdict != batch valueRankDrift")
      assert(RankDriftStream.read(spark, stateDir, "ks").head().toSeq
        == graft.queries.Events.ksTwoSample(curDf, refDf).head().toSeq,
        "published ks != batch ksTwoSample")
      assert(RankDriftStream.read(spark, stateDir, "qq")
        .orderBy("decile").collect().map(_.toSeq).toSeq
        == graft.queries.Events.qqDecileDrift(curDf, refDf)
          .orderBy("decile").collect().map(_.toSeq).toSeq,
        "published qq != batch qqDecileDrift")
      // the shifted regime shows up in the report's triage segments too:
      // a large positive KS gap value and positive upper-decile gaps
      assert(RankDriftStream.read(spark, stateDir, "qq")
        .where(col("decile") === 9L).head().getAs[Long]("gap_centi") > 0L)

      // at-least-once re-delivery of the live batchId is a no-op
      val genLive = RankDriftStream.liveGeneration(stateDir)
      RankDriftStream.refresh(spark, arrivals, refDir, stateDir, 450000L,
        genLive.stripPrefix("gen_").toLong)
      assert(RankDriftStream.liveGeneration(stateDir) == genLive)
    } finally graft.StoredArtifacts.deleteTree(root.toString)
  }

  test("empty samples are total: no-evidence verdicts, never null rows") {
    import spark.implicits._
    val some = sample(50.0, 20, 0L).toDF("event_id", "value")
    val none = spark.emptyDataset[(Long, Double)].toDF("event_id", "value")
    // rank verdict: one well-typed zero row for every empty combination
    for ((cur, ref, nc, nr) <- Seq((none, some, 0L, 20L),
        (some, none, 20L, 0L), (none, none, 0L, 0L))) {
      val r = graft.queries.Events.valueRankDrift(cur, ref, 100000L).head()
      assert(r.getAs[Long]("n_cur") == nc && r.getAs[Long]("n_ref") == nr)
      assert(r.getAs[Long]("u_doubled") == 0L)
      assert(r.getAs[Long]("rb_micro") == 0L, s"rb must be 0, got $r")
      assert(!r.getAs[Boolean]("drifted"))
    }
    // KS: one empty side -> gap 0 (no evidence); both empty -> no rows
    val ks1 = graft.queries.Events.ksTwoSample(none, some).head()
    assert(ks1.getAs[Long]("n_cur") == 0L && ks1.getAs[Long]("ks_micro") == 0L)
    assert(graft.queries.Events.ksTwoSample(none, none).count() == 0L)
    // Q-Q: quantiles of an empty sample are undefined -> no rows, never
    // a silently-garbage decile table
    assert(graft.queries.Events.qqDecileDrift(none, some).count() == 0L)
    assert(graft.queries.Events.qqDecileDrift(some, none).count() == 0L)
  }

  test("rank-biserial verdict is sign-symmetric: swapping samples negates rb") {
    import spark.implicits._
    val lo = sample(40.0, 30, 0L).toDF("event_id", "value")
    val hi = sample(60.0, 30, 100L).toDF("event_id", "value")
    val up = graft.queries.Events.valueRankDrift(hi, lo, 100000L).head()
    val dn = graft.queries.Events.valueRankDrift(lo, hi, 100000L).head()
    assert(up.getAs[Long]("rb_micro") == -dn.getAs[Long]("rb_micro"))
    assert(up.getAs[Boolean]("drifted") && dn.getAs[Boolean]("drifted"))
    // fully separated samples saturate the effect size
    assert(up.getAs[Long]("rb_micro") == 1000000L)
  }
}
