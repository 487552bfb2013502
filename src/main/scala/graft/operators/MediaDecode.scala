package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: media as opaque `binary` columns with typed
  * metadata, processed in partition-batched decode passes.
  *
  * The Spark-side plumbing is real — schema, partition-bounded batch decode
  * via mapPartitions (the JVM analog of arrow-batched mapInPandas: one
  * decoder instantiation per partition, rows streamed through it), typed
  * feature output, deterministic partitioning. The codec itself is the
  * documented stub seam: this container has no image/audio libraries, so
  * [[StubCodec]] derives features from the bytes deterministically. Swapping
  * in a real decoder (JavaCV, TwelveMonkeys, a native lib via JNI) changes
  * ONLY [[Codec.decode]] — no plan, schema, or partitioning changes.
  */
object MediaDecode {

  /** One media payload: id + opaque bytes + declared format. */
  final case class MediaRecord(media_id: Long, format: String, payload: Array[Byte])

  /** Decoded per-payload features (what a real image/audio decode yields:
    * dimensions/duration, channel stats, a content digest).
    */
  final case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      mean_intensity: Double,
      digest: String)

  /** The decoder seam. Implementations must be deterministic per payload. */
  trait Codec extends Serializable {
    def decode(r: MediaRecord): MediaFeatures
  }

  /** STUB: stands in for the real media decoder (none available in this
    * container). Features are deterministic functions of the payload bytes so
    * tests are stable: "dimensions" from length, "intensity" = mean byte
    * value, digest = md5. The real implementation replaces this class only.
    */
  object StubCodec extends Codec {
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.payload.length
      val mean = if (n == 0) 0.0 else r.payload.map(b => (b & 0xff).toDouble).sum / n
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(r.payload).map("%02x".format(_)).mkString
      MediaFeatures(r.media_id, r.format, n.toLong,
        width = math.max(1, n % 1920), height = math.max(1, n % 1080), mean, md)
    }
  }

  /** Partition-batched decode: one codec per partition, rows streamed.
    * Decode parallelism = partition count; callers `repartition(n)` upstream
    * to size batches (payloads are large — partitions must fit the
    * executor's memory budget, the same constraint that sizes arrow batches
    * in the Python flavor of this operator).
    */
  def decode(media: Dataset[MediaRecord], codec: Codec = StubCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(codec.decode))
  }

  /** Frame/chunk sampling plan for large payloads: fixed-size chunk spans as
    * (offset, length) rows, computed without materializing chunks — the scan
    * plan a chunked decoder consumes.
    */
  def chunkPlan(media: DataFrame, chunkBytes: Int = 65536): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L),
          greatest(lit(0L), floor((col("n_bytes") - 1) / chunkBytes).cast("long")))))
      .select(col("media_id"), col("chunk_idx"),
        (col("chunk_idx") * chunkBytes).as("offset"),
        least(lit(chunkBytes.toLong), col("n_bytes") - col("chunk_idx") * chunkBytes)
          .as("len"))
}
