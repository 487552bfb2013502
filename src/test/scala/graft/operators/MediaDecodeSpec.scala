package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaDecodeSpec extends SparkSpec {
  import MediaDecode._

  private def media = {
    import spark.implicits._
    Seq(
      MediaRecord(1L, "img", "hello world".getBytes),
      MediaRecord(2L, "img", "hello world".getBytes),
      MediaRecord(3L, "audio", Array.empty[Byte]),
      MediaRecord(4L, "audio", Array.tabulate(200000)(_.toByte))).toDS()
  }

  test("decode is deterministic and batch-shape independent") {
    val once = decode(media).collect().sortBy(_.media_id)
    val repartitioned = decode(media.repartition(3)).collect().sortBy(_.media_id)
    assert(once.toSeq == repartitioned.toSeq, "partitioning must not change features")
    assert(once(0) == once(1).copy(media_id = 1L), "identical payloads => identical features")
    assert(once(2).n_bytes == 0 && once(2).mean_intensity == 0.0)
  }

  test("chunk plan covers payloads exactly with bounded chunks") {
    val df = media.toDF()
    val plan = chunkPlan(df, chunkBytes = 65536)
    val perMedia = plan.groupBy("media_id")
      .agg(sum("len").as("total"), max("len").as("maxLen"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(perMedia(1L) == ((11L, 11L, 1L)))
    assert(perMedia(3L) == ((0L, 0L, 1L)))
    assert(perMedia(4L)._1 == 200000L)
    assert(perMedia(4L)._2 <= 65536L)
    assert(perMedia(4L)._3 == 4L) // ceil(200000 / 65536)
  }
}
