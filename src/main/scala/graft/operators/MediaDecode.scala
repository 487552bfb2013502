package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: media as opaque `binary` columns with typed
  * metadata, processed in partition-batched decode passes.
  *
  * The Spark-side plumbing — schema, partition-bounded batch decode via
  * mapPartitions (the JVM analog of arrow-batched mapInPandas: one decoder
  * instantiation per partition, rows streamed through it), typed feature
  * output, deterministic partitioning — is shared by all codecs.
  *
  * Two codecs ship:
  *   - [[JdkCodec]] — REAL decoding for the container formats the JDK itself
  *     covers: PNG/JPEG/BMP/GIF via `javax.imageio` (dimensions + mean
  *     luminance + thumbnail resize) and RIFF/WAVE PCM via
  *     `javax.sound.sampled` (sample rate, channels, frame count, RMS
  *     amplitude). Runs headless; no external libraries.
  *   - [[StubCodec]] — deterministic byte-derived features, retained for
  *     payloads in formats the JDK cannot parse (video, RAW vendor formats):
  *     swapping in JavaCV/FFmpeg via JNI changes ONLY [[Codec.decode]] — no
  *     plan, schema, or partitioning changes.
  */
object MediaDecode {

  /** One media payload: id + opaque bytes + declared format. */
  final case class MediaRecord(media_id: Long, format: String, payload: Array[Byte])

  /** Decoded per-payload features. Field meaning is per-modality:
    * images — width/height in px, mean_intensity = mean luminance in [0,255];
    * audio  — width = sample rate (Hz), height = channels, mean_intensity =
    * RMS amplitude normalized to [0,1]; unknown — byte-derived stub values.
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

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** STUB: deterministic features from raw bytes, for formats with no JVM
    * decoder in this container (video etc.): "dimensions" from length,
    * "intensity" = mean byte value, digest = md5.
    */
  object StubCodec extends Codec {
    /** Byte-derived stand-in dimensions, shared with JdkFrameCodec's stub
      * frames so the stub feature contract has one definition.
      */
    private[operators] def stubDims(nBytes: Int): (Int, Int) =
      (math.max(1, nBytes % 1920), math.max(1, nBytes % 1080))

    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.payload.length
      val mean = if (n == 0) 0.0 else r.payload.map(b => (b & 0xff).toDouble).sum / n
      val (w, h) = stubDims(n)
      MediaFeatures(r.media_id, r.format, n.toLong, w, h, mean, md5hex(r.payload))
    }
  }

  /** Real decoder over the JDK's own media stack. Format is sniffed from
    * magic bytes (not trusted from the declared column); anything the JDK
    * cannot parse falls back to [[StubCodec]] features with the declared
    * format preserved, so a mixed corpus never fails the batch.
    */
  object JdkCodec extends Codec {
    // ImageIO on executors must never touch a display
    System.setProperty("java.awt.headless", "true")
    // In-memory ImageIO streams (round 15): with the default useCache=true,
    // EVERY ImageIO.read/createImageInputStream call backs its stream with
    // a fresh temp FILE — per-payload disk churn that serializes a 32-wide
    // decode stage behind filesystem creates (measured: x74's fanned-out
    // decode ran 121 s of task time for 44 s of CPU; memory-cached it is
    // CPU-bound and scales with cores). Payloads are bounded (MaxPixels
    // guard), so the memory stream is strictly better; bytes unchanged.
    javax.imageio.ImageIO.setUseCache(false)

    private def isPng(b: Array[Byte]) = b.length > 8 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    private def isJpeg(b: Array[Byte]) = b.length > 3 &&
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
    private def isBmp(b: Array[Byte]) = b.length > 2 && b(0) == 'B' && b(1) == 'M'
    private def isGif(b: Array[Byte]) = b.length > 6 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F'
    private[operators] def looksGif(b: Array[Byte]): Boolean = isGif(b)
    private def isWave(b: Array[Byte]) = b.length > 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    /** Decompression-bomb / garbage-sniff guard: max pixels decoded per
      * payload. Header dimensions are validated BEFORE the raster is
      * allocated, so a text payload that happens to start with "BM" (whose
      * "header" then claims absurd dimensions) or an adversarial 60000x60000
      * PNG falls back to stub features instead of an executor-killing
      * allocation.
      */
    val MaxPixels: Long = 64L * 1024 * 1024

    def decode(r: MediaRecord): MediaFeatures = {
      val b = r.payload
      try {
        if (isPng(b) || isJpeg(b) || isBmp(b) || isGif(b)) decodeImage(r)
        else if (isWave(b)) decodeWav(r)
        else StubCodec.decode(r)
      } catch {
        case _: Exception => StubCodec.decode(r)
        case _: OutOfMemoryError => StubCodec.decode(r) // belt for the guard
      }
    }

    /** ONE definition of the decompression-bomb-guarded image read, shared
      * by decodeImage, resize, and perceptualHash: header-only dimension
      * check against [[MaxPixels]] BEFORE any raster is allocated; None for
      * unreadable/oversized payloads.
      */
    private[operators] def readImageGuarded(
        payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      val ok = imageDims(payload).exists { case (w, h) =>
        w > 0 && h > 0 && w.toLong * h <= MaxPixels
      }
      if (!ok) None
      else Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    }

    /** Rec. 601 luma — the one luminance definition every image feature
      * in this object derives from.
      */
    private[operators] def luminance(rgb: Int): Double =
      0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)

    /** Header-only dimension read; None when no reader or invalid header. */
    private[operators] def imageDims(payload: Array[Byte]): Option[(Int, Int)] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            Some((reader.getWidth(0), reader.getHeight(0)))
          } finally reader.dispose()
        }
      } finally iis.close()
    }

    private def decodeImage(r: MediaRecord): MediaFeatures = {
      val img = readImageGuarded(r.payload).orNull
      if (img == null) return StubCodec.decode(r)
      val (w, h) = (img.getWidth, img.getHeight)
      // mean luminance over a bounded deterministic sample grid (<= 64x64)
      val sx = math.max(1, w / 64)
      val sy = math.max(1, h / 64)
      var sum = 0.0; var n = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          sum += luminance(img.getRGB(x, y)); n += 1
          x += sx
        }
        y += sy
      }
      MediaFeatures(r.media_id, r.format, r.payload.length.toLong, w, h,
        if (n == 0) 0.0 else sum / n, md5hex(r.payload))
    }

    private def decodeWav(r: MediaRecord): MediaFeatures = {
      import javax.sound.sampled._
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(r.payload))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) return StubCodec.decode(r)
        val bytes = in.readAllBytes()
        val le = !fmt.isBigEndian
        var sumSq = 0.0; var n = 0
        var i = 0
        while (i + 1 < bytes.length) {
          val s = if (le) ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
            else ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
          val v = s / 32768.0
          sumSq += v * v; n += 1
          i += 2
        }
        val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
        MediaFeatures(r.media_id, r.format, r.payload.length.toLong,
          width = fmt.getSampleRate.toInt, height = fmt.getChannels, rms,
          md5hex(r.payload))
      } finally in.close()
    }
  }

  /** Partition-batched decode: one codec per partition, rows streamed.
    * Decode parallelism = partition count; callers `repartition(n)` upstream
    * to size batches (payloads are large — partitions must fit the
    * executor's memory budget, the same constraint that sizes arrow batches
    * in the Python flavor of this operator).
    */
  def decode(media: Dataset[MediaRecord], codec: Codec = JdkCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(codec.decode))
  }

  /** One resized thumbnail per image payload. */
  final case class Thumb(media_id: Long, width: Int, height: Int, png: Array[Byte])

  /** Image resize: decode → Graphics2D scale to fit within `maxDim` (aspect
    * preserved) → re-encode PNG. Non-image payloads are dropped (a media
    * pipeline resizes only its image modality). Same partition-batched
    * execution model as [[decode]].
    */
  def resize(media: Dataset[MediaRecord], maxDim: Int = 64): Dataset[Thumb] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      it.flatMap { r =>
        try {
          val img = JdkCodec.readImageGuarded(r.payload).orNull
          if (img == null) None
          else {
            val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
            val (tw, th) = (math.max(1, (img.getWidth * scale).toInt),
              math.max(1, (img.getHeight * scale).toInt))
            val out = new java.awt.image.BufferedImage(
              tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.drawImage(img, 0, 0, tw, th, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Some(Thumb(r.media_id, tw, th, bos.toByteArray))
          }
        } catch { case _: Exception => None }
      }
    }
  }

  /** 64-bit perceptual fingerprint (as 16 lowercase hex chars).
    * `real_decode` says which path produced it — the aHash of a decoded
    * raster, or the byte-derived stub.
    */
  final case class PHash(media_id: Long, phash: String, real_decode: Boolean)

  /** Average-hash (aHash) perceptual fingerprint: decode → 8×8 box-mean
    * luminance grid → bit (row-major, MSB first) set iff its cell is
    * brighter than the grid mean. Robust to resizing and re-encoding (the
    * box means barely move), so near-duplicate IMAGES land within a small
    * Hamming distance — the image-modality analog of SimHash over tokens
    * (x04), consumed the same way: band the 64 bits, bucket-join on bands,
    * confirm candidates by Hamming distance. With 4 bands, recovery of a
    * candidate is GUARANTEED for pairs up to 3 bits apart (pigeonhole) and
    * probabilistic beyond — size the band count to the confirm threshold
    * (b bands guarantee t ≤ b-1). PHashSpec pins robustness
    * (scaled/re-encoded copy ≤ 6 bits apart), separation (inverted image
    * ≥ 48 bits apart), and the banding guarantee.
    *
    * FLAT images (every cell equal): textureless aHash would emit all-zero
    * bits for every uniform image — merging a white placeholder with a
    * black one. Such payloads instead hash to their 8-bit quantized
    * brightness replicated across all 8 bytes, so flat images separate by
    * brightness (and an inverted flat image still lands far away).
    *
    * Per-cell means are computed over a bounded sample grid (≤ 8×8 samples
    * per cell, ≤ 4096 getRGB calls per payload regardless of resolution) —
    * the same cost discipline as decodeImage's 64×64 grid.
    *
    * Payloads the JDK cannot decode take the deterministic byte-derived
    * stub (first 64 bits of the md5 digest, `real_decode = false`) — the
    * same honesty contract as [[StubCodec]]: plumbing stays testable and
    * oracle-exact on text-derived fixtures, and only this object changes
    * when a real video/image codec is swapped in.
    */
  def perceptualHash(media: Dataset[MediaRecord]): Dataset[PHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      it.map { r =>
        val fromImage =
          try {
            JdkCodec.readImageGuarded(r.payload).map { img =>
              val (w, h) = (img.getWidth, img.getHeight)
              val cells = new Array[Double](64)
              var cy = 0
              while (cy < 8) {
                var cx = 0
                while (cx < 8) {
                  // integer block bounds partition the image exactly; a
                  // sub-8px dimension degenerates to repeated single rows
                  val x0 = w * cx / 8; val x1 = math.min(w, math.max(x0 + 1, w * (cx + 1) / 8))
                  val y0 = h * cy / 8; val y1 = math.min(h, math.max(y0 + 1, h * (cy + 1) / 8))
                  val sx = math.max(1, (x1 - x0) / 8)
                  val sy = math.max(1, (y1 - y0) / 8)
                  var sum = 0.0; var n = 0
                  var y = y0
                  while (y < y1) {
                    var x = x0
                    while (x < x1) {
                      sum += JdkCodec.luminance(img.getRGB(x, y)); n += 1
                      x += sx
                    }
                    y += sy
                  }
                  cells(cy * 8 + cx) = if (n == 0) 0.0 else sum / n
                  cx += 1
                }
                cy += 1
              }
              val mean = cells.sum / 64
              var spreadMax = cells(0); var spreadMin = cells(0)
              cells.foreach { c =>
                if (c > spreadMax) spreadMax = c
                if (c < spreadMin) spreadMin = c
              }
              val bits =
                if (spreadMax == spreadMin) {
                  // flat image: brightness byte replicated (see scaladoc)
                  val b = math.min(255L, math.max(0L, math.round(mean)))
                  (0 until 8).foldLeft(0L)((acc, i) => acc | (b << (8 * i)))
                } else {
                  var acc = 0L
                  var i = 0
                  while (i < 64) {
                    if (cells(i) > mean) acc |= (1L << (63 - i))
                    i += 1
                  }
                  acc
                }
              PHash(r.media_id, f"$bits%016x", real_decode = true)
            }
          } catch { case _: Exception => None }
        fromImage.getOrElse(
          PHash(r.media_id, md5hex(r.payload).take(16), real_decode = false))
      }
    }
  }

  /** One sampled frame. For real (animated-GIF) frames `frame_len` is the
    * pixel count and `digest` hashes the decoded raster; for stub frames
    * (formats outside the JDK: video containers) `frame_len` is the byte
    * span length and `digest` hashes the span — the span arithmetic
    * (`n*i/k` bounds) is what x28's oracle reproduces in SQL.
    */
  final case class Frame(
      media_id: Long, frame_idx: Int, n_frames: Int,
      width: Int, height: Int, mean_intensity: Double,
      frame_len: Long, digest: String)

  /** Frame-sampling seam, same contract as [[Codec]]: deterministic. */
  trait FrameCodec extends Serializable {
    def sample(r: MediaRecord, maxFrames: Int): Seq[Frame]
  }

  /** Uniform frame sampling. Animated GIF is REALLY decoded — ImageIO
    * reads each sampled frame's raster (the one multi-frame format the JDK
    * ships a decoder for). Everything else (true video) gets deterministic
    * uniform byte spans of the payload, the honest stand-in for an FFmpeg
    * frame grab: swapping in JavaCV changes only this object.
    */
  object JdkFrameCodec extends FrameCodec {
    System.setProperty("java.awt.headless", "true")

    def sample(r: MediaRecord, maxFrames: Int): Seq[Frame] = {
      val b = r.payload
      if (b.isEmpty || maxFrames <= 0) return Nil
      try {
        if (JdkCodec.looksGif(b)) gifFrames(r, maxFrames) else stubFrames(r, maxFrames)
      } catch {
        case _: Exception => stubFrames(r, maxFrames)
        case _: OutOfMemoryError => stubFrames(r, maxFrames) // belt for the guard
      }
    }

    private def gifFrames(r: MediaRecord, maxFrames: Int): Seq[Frame] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return stubFrames(r, maxFrames)
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          val total = reader.getNumImages(true)
          if (total <= 0) return stubFrames(r, maxFrames)
          val k = math.min(maxFrames, total)
          // uniform sample incl. first and last frame (j*(total-1)/(k-1))
          val indices =
            if (k == 1) Seq(0)
            else (0 until k).map(j => (j.toLong * (total - 1) / (k - 1)).toInt)
          indices.zipWithIndex.map { case (idx, j) =>
            // bomb guard BEFORE the raster is allocated: header-only dims
            // (same header-first discipline as decodeImage/resize)
            val (hw, hh) = (reader.getWidth(idx), reader.getHeight(idx))
            if (hw <= 0 || hh <= 0 || hw.toLong * hh > JdkCodec.MaxPixels)
              return stubFrames(r, maxFrames)
            val img = reader.read(idx)
            val (w, h) = (img.getWidth, img.getHeight)
            if (w.toLong * h > JdkCodec.MaxPixels) return stubFrames(r, maxFrames)
            val rgb = new Array[Int](w * h)
            img.getRGB(0, 0, w, h, rgb, 0, w)
            var sum = 0.0
            var i = 0
            while (i < rgb.length) {
              val p = rgb(i)
              sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
                0.114 * (p & 0xff)
              i += 1
            }
            val bytes = java.nio.ByteBuffer.allocate(rgb.length * 4)
            rgb.foreach(bytes.putInt)
            Frame(r.media_id, j, k, w, h,
              if (rgb.isEmpty) 0.0 else sum / rgb.length,
              w.toLong * h, md5hex(bytes.array()))
          }
        } finally reader.dispose()
      } finally iis.close()
    }

    /** Uniform byte spans: frame j covers [n*j/k, n*(j+1)/k). */
    private def stubFrames(r: MediaRecord, maxFrames: Int): Seq[Frame] = {
      val n = r.payload.length
      val k = math.min(maxFrames, math.max(1, n))
      (0 until k).map { j =>
        val from = (n.toLong * j / k).toInt
        val until = (n.toLong * (j + 1) / k).toInt
        val span = java.util.Arrays.copyOfRange(r.payload, from, until)
        val mean =
          if (span.isEmpty) 0.0
          else span.map(x => (x & 0xff).toDouble).sum / span.length
        val (w, h) = StubCodec.stubDims(span.length)
        Frame(r.media_id, j, k, w, h, mean, span.length.toLong, md5hex(span))
      }
    }
  }

  /** Uniform frame sampling over a media column — one row per sampled
    * frame. Same partition-batched execution model as [[decode]]: one
    * codec per partition, payloads streamed, fan-out bounded by
    * `maxFrames` per payload.
    */
  def frameSample(
      media: Dataset[MediaRecord], maxFrames: Int = 4,
      codec: FrameCodec = JdkFrameCodec): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap(codec.sample(_, maxFrames)))
  }

  /** Deterministic REAL image payloads for the fixtures (which are
    * text-only): a 32×32 black/white GIF whose 8×8 block pattern encodes
    * [[patternBits]] of an id. The point is an ORACLE over the actual
    * decode path: [[perceptualHash]]'s aHash of this image equals the
    * pattern exactly (cells are pure 0/255 luminance, the mean sits
    * strictly between, and GIF is lossless for 2-color images), and the
    * same 64-bit value is computable in plain SQL from the id — so a
    * DuckDB hash compare verifies ImageIO decode + the sampling grid +
    * the bit assembly end to end, not a stub (x74).
    */
  object SyntheticImages {
    // same temp-file-vs-memory point as JdkCodec: the per-doc GIF ENCODE
    // otherwise creates a FileCacheImageOutputStream temp file per payload
    javax.imageio.ImageIO.setUseCache(false)

    /** Cell i (row-major, i in 1..63) is white iff (id + i) % 3 == 0;
      * cell 0 stays black, keeping the value positive so the SQL oracle
      * needs no signed-overflow care. Always mixed (≥ 20 white cells), so
      * the flat-image special case never triggers.
      */
    def patternBits(id: Long): Long = {
      var acc = 0L
      var i = 1
      while (i < 64) {
        if ((id + i) % 3 == 0) acc |= (1L << (63 - i))
        i += 1
      }
      acc
    }

    /** The pattern as a real GIF payload (4×4-pixel blocks). */
    def gif(id: Long): Array[Byte] = {
      val bits = patternBits(id)
      val img = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          val white = (bits & (1L << (63 - (cy * 8 + cx)))) != 0
          val rgb = if (white) 0xffffff else 0x000000
          var y = cy * 4
          while (y < cy * 4 + 4) {
            var x = cx * 4
            while (x < cx * 4 + 4) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          cx += 1
        }
        cy += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "gif", out),
        "JDK GIF writer missing — cannot synthesize image payloads")
      out.toByteArray
    }
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
