package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The x260 Poisson-bootstrap estimator maintained incrementally: landed
  * batches contribute mergeable (Σw·x, Σw) deltas — never a recompute
  * over history — and the merged state equals the one-shot batch
  * computation over the same rows, in any arrival order.
  */
class BootstrapStreamSpec extends SparkSpec {

  private def sample(base: Long, n: Int, center: Double) =
    (0 until n).map(i => (base + i, center + (i % 11) * 3 + 0.25))

  private def writeFile(dir: String, name: String,
      rows: Seq[(Long, Double)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-bootday").toString
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

  private def runOnce(arrivalsDir: String, stateDir: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val q = BootstrapStream.start(spark, arrivalsDir, stateDir, schema,
      trigger = Trigger.AvailableNow(), pathGlobFilter = "*.parquet")
    q.awaitTermination(60000)
    assert(!q.isActive)
  }

  test("incremental accumulators merge to the one-shot batch state exactly") {
    val root = Files.createTempDirectory("graft-bootstream")
    val arrivals = root.resolve("arrivals").toString
    val stateDir = root.resolve("state").toString
    try {
      writeFile(arrivals, "b1", sample(0L, 40, 100.0))
      val schema = spark.read.parquet(arrivals).schema
      runOnce(arrivals, stateDir, schema)
      assert(BootstrapStream.published(stateDir))
      val gen1 = BootstrapStream.liveGeneration(stateDir)

      // second batch lands; the maintainer merges, never re-reads b1
      writeFile(arrivals, "b2", sample(1000L, 60, 180.0))
      runOnce(arrivals, stateDir, schema)
      assert(BootstrapStream.liveGeneration(stateDir) != gen1)

      // mergeability proof: the stored accumulators equal the one-shot
      // computation over ALL rows, replicate for replicate
      val all = BootstrapStream.asKernelInput(spark.read.parquet(arrivals))
      def accMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getAs[Number]("b").longValue ->
          ((r.getDecimal(1).longValueExact(), r.getLong(2)))).toMap
      val oneShotAcc = accMap(BootstrapStream.accumulate(all))
      val storedAcc = accMap(BootstrapStream.read(spark, stateDir, "acc"))
      assert(storedAcc == oneShotAcc, "merged state != one-shot state")

      // verdict parity: published row equals batch verdict over all rows
      val direct = BootstrapStream.verdict(
        BootstrapStream.accumulate(all), BootstrapStream.totals(all)).head()
      val pub = BootstrapStream.read(spark, stateDir).head()
      assert(pub.toSeq == direct.toSeq, "published verdict != batch verdict")
      // the band straddles the exact mean on this fixture
      assert(pub.getAs[Long]("ci_lo_cents") <= pub.getAs[Long]("mean_cents"))
      assert(pub.getAs[Long]("ci_hi_cents") >= pub.getAs[Long]("mean_cents"))

      // at-least-once: re-delivering the live batchId is a no-op
      val live = BootstrapStream.liveGeneration(stateDir)
      BootstrapStream.update(spark,
        spark.read.parquet(arrivals).limit(0), stateDir,
        live.stripPrefix("gen_").toLong)
      assert(BootstrapStream.liveGeneration(stateDir) == live)
      assert(BootstrapStream.read(spark, stateDir).head().toSeq == pub.toSeq)
    } finally graft.StoredArtifacts.deleteTree(root.toString)
  }
}
