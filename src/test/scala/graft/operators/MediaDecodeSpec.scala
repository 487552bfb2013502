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

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(sampleRate: Float, amplitude: Short, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) { // constant-amplitude signal: RMS == |amplitude|/32768
      pcm(2 * i) = (amplitude & 0xff).toByte
      pcm(2 * i + 1) = ((amplitude >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("JdkCodec really decodes PNG: exact dimensions and luminance") {
    import spark.implicits._
    // pure gray 0x808080: luminance == 128 exactly at every sampled pixel
    val ds = Seq(
      MediaRecord(1L, "img", pngBytes(20, 10, 0x808080)),
      MediaRecord(2L, "img", pngBytes(100, 70, 0xFFFFFF))).toDS()
    val out = decode(ds).collect().sortBy(_.media_id)
    assert(out(0).width == 20 && out(0).height == 10)
    assert(math.abs(out(0).mean_intensity - 128.0) < 0.5, out(0).toString)
    assert(out(1).width == 100 && out(1).height == 70)
    assert(math.abs(out(1).mean_intensity - 255.0) < 0.5, out(1).toString)
  }

  test("JdkCodec really parses WAV: sample rate, channels, RMS amplitude") {
    import spark.implicits._
    val half = (16384: Short) // 0.5 in normalized amplitude
    val ds = Seq(MediaRecord(7L, "audio", wavBytes(8000f, half, 4000))).toDS()
    val f = decode(ds).head()
    assert(f.width == 8000, "width carries the sample rate")
    assert(f.height == 1, "height carries the channel count")
    assert(math.abs(f.mean_intensity - 0.5) < 1e-3, s"RMS of constant 0.5 signal: $f")
  }

  test("non-media payloads fall back to stub features, never fail the batch") {
    import spark.implicits._
    val raw = MediaRecord(9L, "video", "not a real container".getBytes)
    val viaJdk = decode(Seq(raw).toDS()).head()
    val viaStub = StubCodec.decode(raw)
    assert(viaJdk == viaStub)
  }

  test("resize produces aspect-preserving thumbnails that re-decode") {
    import spark.implicits._
    val ds = Seq(
      MediaRecord(1L, "img", pngBytes(128, 64, 0x204060)),
      MediaRecord(2L, "raw", "junk".getBytes)).toDS() // dropped: not an image
    val thumbs = resize(ds, maxDim = 32).collect()
    assert(thumbs.length == 1)
    val t = thumbs.head
    assert(t.width == 32 && t.height == 16, s"aspect preserved: ${t.width}x${t.height}")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(t.png))
    assert(back.getWidth == 32 && back.getHeight == 16)
    assert((back.getRGB(16, 8) & 0xFFFFFF) == 0x204060, "uniform color survives the resize")
  }

  /** Animated GIF: frames appended via ImageIO's write sequence. */
  private def animatedGifBytes(grays: Seq[Int], w: Int = 8, h: Int = 6): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      grays.foreach { g =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  test("frameSample really decodes animated GIF frames (uniform, incl. first+last)") {
    import spark.implicits._
    // 5 frames with increasing gray level; sample 3 => frames 0, 2, 4
    val gif = animatedGifBytes(Seq(0, 60, 120, 180, 240))
    val ds = Seq(MediaRecord(9L, "video", gif)).toDS()
    val frames = frameSample(ds, maxFrames = 3).collect().sortBy(_.frame_idx)
    assert(frames.length == 3 && frames.forall(_.n_frames == 3))
    assert(frames.forall(f => f.width == 8 && f.height == 6),
      s"real raster dimensions expected: ${frames.toSeq}")
    // gray g decodes to luminance ~g (GIF palette quantization allows slack)
    val lums = frames.map(_.mean_intensity)
    assert(math.abs(lums(0) - 0) < 8 && math.abs(lums(1) - 120) < 8 &&
      math.abs(lums(2) - 240) < 8, s"sampled luminances: ${lums.toSeq}")
    assert(frames.map(_.digest).distinct.length == 3, "distinct frames, distinct digests")
  }

  test("frameSample stub path: uniform byte spans cover the payload exactly") {
    import spark.implicits._
    val payload = Array.tabulate(1003)(_.toByte) // not a GIF => stub spans
    val ds = Seq(MediaRecord(5L, "video", payload)).toDS()
    val frames = frameSample(ds, maxFrames = 4).collect().sortBy(_.frame_idx)
    assert(frames.length == 4)
    assert(frames.map(_.frame_len).sum == 1003, "spans must partition the payload")
    assert(frames.map(_.digest).distinct.length == 4)
    // determinism across partitioning (the decode-batch contract)
    val re = frameSample(ds.repartition(3), maxFrames = 4).collect().sortBy(_.frame_idx)
    assert(frames.toSeq == re.toSeq)
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
