package graft.operators

import graft.SparkSpec

/** Gates for the aHash perceptual fingerprint: the property that makes it a
  * DEDUP key — invariance under the transformations that preserve what an
  * image looks like (scaling, re-encoding) and separation under the ones
  * that don't — plus the stub contract for undecodable payloads.
  */
class PHashSpec extends SparkSpec {

  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // luminance rises left to right, banded top to bottom — enough
      // structure that each 8x8 cell has a distinct mean
      val v = math.min(255, (255.0 * x / w).toInt + (if ((y * 8 / h) % 2 == 0) 0 else 32))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    pngOf(img)
  }

  private def pngOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def scaled(png: Array[Byte], sw: Int, sh: Int): Array[Byte] = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val out = new java.awt.image.BufferedImage(
      sw, sh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.drawImage(src, 0, 0, sw, sh, null)
    g.dispose()
    pngOf(out)
  }

  private def inverted(png: Array[Byte]): Array[Byte] = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val out = new java.awt.image.BufferedImage(
      src.getWidth, src.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until src.getHeight; x <- 0 until src.getWidth)
      out.setRGB(x, y, ~src.getRGB(x, y) & 0xffffff)
    pngOf(out)
  }

  private def hashesOf(payloads: Seq[(Long, Array[Byte])]): Map[Long, (String, Boolean)] = {
    import spark.implicits._
    val ds = payloads.map { case (id, b) => MediaDecode.MediaRecord(id, "img", b) }
      .toDS()
    MediaDecode.perceptualHash(ds).collect()
      .map(p => p.media_id -> ((p.phash, p.real_decode))).toMap
  }

  private def hamming(a: String, b: String): Int =
    java.lang.Long.bitCount(
      java.lang.Long.parseUnsignedLong(a, 16) ^ java.lang.Long.parseUnsignedLong(b, 16))

  test("aHash is invariant under scaling and re-encoding, and separates inversion") {
    val base = gradientPng(64, 48)
    val h = hashesOf(Seq(
      1L -> base,
      2L -> scaled(base, 128, 96), // 2x upscale, fresh PNG encode
      3L -> scaled(base, 32, 24),  // 2x downscale
      4L -> inverted(base)))
    assert(h.values.forall(_._2), "all four payloads must take the real decode path")
    val (b, up, down, inv) = (h(1L)._1, h(2L)._1, h(3L)._1, h(4L)._1)
    assert(hamming(b, up) <= 6, s"upscaled copy drifted ${hamming(b, up)} bits")
    assert(hamming(b, down) <= 6, s"downscaled copy drifted ${hamming(b, down)} bits")
    assert(hamming(b, inv) >= 48,
      s"inversion flips bright/dark cells; got only ${hamming(b, inv)} bits")
  }

  test("banded candidate recovery finds the near-dup pair a full-hash join misses") {
    // the x04 consumption pattern on the image hash: a scaled copy differs
    // in a few bits (so exact grouping misses it) but at least one of the
    // 4 x 16-bit bands is identical, so the banded bucket-join surfaces the
    // candidate and the Hamming confirm keeps it
    val base = gradientPng(64, 48)
    val h = hashesOf(Seq(1L -> base, 2L -> scaled(base, 128, 96)))
    val (a, b) = (h(1L)._1, h(2L)._1)
    val bands = (0 until 4).map(i => (a.substring(4 * i, 4 * i + 4),
      b.substring(4 * i, 4 * i + 4)))
    assert(bands.exists { case (x, y) => x == y },
      s"a <= 6-bit-apart pair must share at least one of 4 bands: $a vs $b")
    assert(hamming(a, b) <= 6)
  }

  test("undecodable payloads take the md5-prefix stub path deterministically") {
    val h = hashesOf(Seq(7L -> "not an image".getBytes("UTF-8")))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("not an image".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h(7L) == ((md.take(16), false)))
  }
}
