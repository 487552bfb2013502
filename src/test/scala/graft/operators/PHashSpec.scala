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

  test("banded candidate recovery: b bands guarantee pairs up to b-1 bits apart") {
    // the x04 consumption pattern on the image hash: candidates come from a
    // bucket-join on hash bands. The guarantee is pigeonhole — flipping at
    // most b-1 bits cannot touch all b bands — so recovery at confirm
    // threshold t needs b > t bands. Pin the math on adversarial flips:
    // any 3 bits spread across a 4-band hash leave >= 1 band intact...
    val a = java.lang.Long.parseUnsignedLong("5a5a5a5a5a5a5a5a", 16)
    for (flips <- Seq(Seq(0), Seq(0, 16, 32), Seq(63, 47, 31), Seq(5, 6, 7))) {
      val b = flips.foldLeft(a)((v, i) => v ^ (1L << i))
      val (ha, hb) = (f"$a%016x", f"$b%016x")
      val shared = (0 until 4).exists(i =>
        ha.substring(4 * i, 4 * i + 4) == hb.substring(4 * i, 4 * i + 4))
      assert(shared, s"<= 3 flipped bits must leave one of 4 bands intact: $flips")
    }
    // ...while 4 bits CAN touch all 4 bands — recovery beyond b-1 is
    // probabilistic, which is why the threshold sizes the band count
    val b4 = Seq(0, 16, 32, 48).foldLeft(a)((v, i) => v ^ (1L << i))
    val (ha, hb4) = (f"$a%016x", f"$b4%016x")
    assert(!(0 until 4).exists(i =>
      ha.substring(4 * i, 4 * i + 4) == hb4.substring(4 * i, 4 * i + 4)),
      "a 4-band-spread 4-bit flip shares no band — the guarantee's sharp edge")
    // and the real scaled pair from the invariance gate is recoverable with
    // bands sized to its measured drift (b = drift + 1)
    val base = gradientPng(64, 48)
    val h = hashesOf(Seq(1L -> base, 2L -> scaled(base, 128, 96)))
    val drift = hamming(h(1L)._1, h(2L)._1)
    assert(drift <= 6)
    val bands = drift + 1
    val bitsPer = 64 / bands
    val la = java.lang.Long.parseUnsignedLong(h(1L)._1, 16)
    val lb = java.lang.Long.parseUnsignedLong(h(2L)._1, 16)
    val sharedBand = (0 until bands).exists { i =>
      val lo = i * bitsPer
      val width = if (i == bands - 1) 64 - lo else bitsPer
      val mask = if (width == 64) -1L else ((1L << width) - 1) << lo
      (la & mask) == (lb & mask)
    }
    assert(sharedBand, s"drift-$drift pair must share one of ${bands} bands")
  }

  test("flat images hash to their brightness, separating white from black") {
    // textureless payloads: plain aHash would emit all zeros for EVERY
    // uniform image, merging a white placeholder with a black one — the
    // brightness-replication fallback keeps them apart
    def flatPng(v: Int) = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      pngOf(img)
    }
    val h = hashesOf(Seq(1L -> flatPng(255), 2L -> flatPng(0), 3L -> flatPng(255)))
    assert(h(1L) == (("ffffffffffffffff", true)))
    assert(h(2L) == (("0000000000000000", true)))
    assert(h(1L)._1 == h(3L)._1, "identical flat images still collide (dedup works)")
    assert(hamming(h(1L)._1, h(2L)._1) == 64, "white vs black maximally separated")
  }

  test("undecodable payloads take the md5-prefix stub path deterministically") {
    val h = hashesOf(Seq(7L -> "not an image".getBytes("UTF-8")))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("not an image".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h(7L) == ((md.take(16), false)))
  }

  test("x74: synthesized GIFs really decode and their aHash equals the planted pattern bit-for-bit") {
    import graft.operators.MediaDecode.SyntheticImages
    val got = graft.SparkEntry.queries("x74_image_real_decode")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(got.nonEmpty)
    for ((id, phash, real) <- got) {
      assert(real, s"doc $id must take the REAL ImageIO path, not the stub fallback")
      val want = f"${SyntheticImages.patternBits(id)}%016x"
      assert(phash == want, s"doc $id: decoded aHash $phash != planted pattern $want")
    }
  }

  test("x60's banded query recovers exact-group dedup on the fixture and never shuffles payloads") {
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries("x60_image_near_dup")(spark, sf001)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq

    // ground truth, computed independently: the fixture's stub phashes are
    // identical within a planted class and ~32 bits apart across classes,
    // so banding (4 bands, guarantee t <= 3) + Hamming <= 3 confirm must
    // reproduce the EXACT phash-equality groups
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("phash"))
    val expected = graft.Tables(spark, sf001, "documents")
      .select(col("doc_id").as("media_id"),
        substring(md5(concat(lit("img-"), col("doc_id") % 25)), 1, 16).as("phash"))
      .withColumn("keeper", min(col("media_id")).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .where(col("n_copies") >= 2)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(rows.nonEmpty && rows == expected,
      "banded near-dup must equal the exact-group formulation on this fixture")

    // scale pin: after fingerprinting, nothing that moves carries media —
    // every exchange in the final plan is (band, id) or (id, hash) wide;
    // the one intentional payload move (decode batch sizing) sits behind
    // the fingerprint checkpoint and media never shuffles again
    val nodes = graft.SparkSpec.allPlanNodes(df.queryExecution.executedPlan)
    val exchanges = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "expected shuffles in the banded plan")
    val heavy = exchanges.filter(_.output.exists(a =>
      a.name == "payload" || a.name == "text"))
    assert(heavy.isEmpty,
      s"banded dedup must shuffle only bands/ids/hashes, found: ${heavy.map(_.output)}")
  }

  test("x388 threshold curve: the pigeonhole edge is measured, not assumed") {
    val rows = graft.SparkEntry.queries("x388_phash_threshold_curve")(spark, sf001)
      .orderBy("tau").collect()
    assert(rows.map(_.getAs[Long]("tau")).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 6L))
    rows.foreach { r =>
      val (t, b) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_banded"))
      assert(b <= t, "banding can only ever lose pairs")
      // 4 bands over 32 bits: any pair within Hamming 3 shares at least
      // one untouched 8-bit band — recall is EXACTLY total through tau=3
      if (r.getAs[Long]("tau") <= 3L) {
        assert(b == t, s"pigeonhole guarantee broken at tau=${r.getAs[Long]("tau")}")
        if (t > 0) assert(r.getAs[Long]("recall_milli") == 1000L)
      }
    }
    // widening tau only adds pairs, on both tiers
    val ts = rows.map(_.getAs[Long]("n_true"))
    val bs = rows.map(_.getAs[Long]("n_banded"))
    assert(ts.zip(ts.tail).forall { case (a, b2) => a <= b2 })
    assert(bs.zip(bs.tail).forall { case (a, b2) => a <= b2 })
    // the graded fixture must actually exercise the fall-off: some pair
    // beyond tau=3 exists whose bands all differ (else the curve row
    // measures nothing x60 doesn't already pin)
    assert(rows.last.getAs[Long]("n_banded") < rows.last.getAs[Long]("n_true"),
      "expected banding loss above the pigeonhole edge on the graded fixture")
  }
}
