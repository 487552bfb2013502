package graft.streaming

import graft.StoredManifest
import graft.queries.Events
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental maintenance of the daily HLL distinct-count sketches —
  * [[MvMaintainStream]]'s sibling for the NON-additive aggregate: where the
  * summary folds with count-add/sum-add/min-max, the register table folds
  * with bytewise MAX, which is commutative, associative, AND idempotent.
  * Idempotence is the extra gift: re-folding the same rows is a no-op, so
  * this maintainer is insensitive not just to merge order but to
  * at-least-once DUPLICATION of input rows — the strongest consistency
  * class any of the engine's incremental artifacts enjoys, and
  * StreamingSketchSpec pins it (maintained sketches ≡ full rebuild,
  * bit-identical, even when a batch is replayed wholesale).
  *
  * Per micro-batch: registers of the batch rows ([[Events.hllRegisterRows]]
  * via [[Events.hllDailySketch]]) max-merge into the live generation and
  * publish under the same batch-id-named manifest generation protocol as
  * every stored artifact here. Serving = [[Events.hllEstimate]] over the
  * live generation: per-day distinct estimates, no fact re-scan ever.
  */
object SketchMaintainStream {

  def sketchPath(dir: String, gen: String): String = s"$dir/$gen/sketch"

  def start(spark: SparkSession, factDir: String, dir: String, ckpt: String,
      trigger: Trigger = Trigger.ProcessingTime("5 minutes")): StreamingQuery =
    spark.readStream
      .schema(MvMaintainStream.factSchema.add("user_id",
        org.apache.spark.sql.types.LongType))
      .parquet(factDir)
      .writeStream
      .queryName("hll-sketch-maintain")
      .option("checkpointLocation", ckpt)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintain(spark, batch, dir, batchId)
      }
      .start()

  def maintain(spark: SparkSession, batch: DataFrame, dir: String,
      batchId: Long): Unit = {
    val gen = s"gen_$batchId"
    if (StoredManifest.exists(dir) && StoredManifest.read(dir)._1 == gen)
      return
    StoredManifest.sweepUnreachable(dir)
    val partials = Events.hllDailySketch(batch)
    val merged = current(spark, dir) match {
      case Some(cur) => Events.hllMergeSketches(cur.unionByName(partials))
      case None => Events.hllMergeSketches(partials)
    }
    merged.coalesce(1).write.mode("overwrite").parquet(sketchPath(dir, gen))
    StoredManifest.write(dir, gen, Seq("sketch"))
  }

  def current(spark: SparkSession, dir: String): Option[DataFrame] =
    if (StoredManifest.exists(dir))
      Some(spark.read.parquet(sketchPath(dir, StoredManifest.read(dir)._1)))
    else None

  /** Per-day distinct estimates from the live generation. */
  def estimates(spark: SparkSession, dir: String): DataFrame =
    Events.hllEstimate(
      current(spark, dir).getOrElse(
        sys.error(s"no sketch generation published under $dir")),
      Seq("day"))
      .select("day", "est_n")
}
