package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.Dataset

/** Audio-container plumbing with a REAL decode path (the x74 GIF
  * discipline applied to sound): synthetic PCM tracks are wrapped in
  * genuine WAV containers by the JDK's `javax.sound.sampled` encoder,
  * and the operator decodes them back through `AudioSystem`'s parser —
  * header fields (sample rate, width, channels, endianness) come from
  * the REAL RIFF/fmt chunks, not from trusting the generator. Because
  * the PCM values follow a closed-form integer formula, a relational
  * oracle replays the expected window energies directly: any defect in
  * the container writer, the header parser, or the sample
  * reconstruction breaks the row hash (a silent fallback cannot pass).
  *
  * Scale shape: embarrassingly parallel mapPartitions — one narrow pass,
  * no exchange; payloads live as `binary` columns exactly as a real
  * audio corpus would, and only the windowed energies (4 small rows per
  * track) ever shuffle.
  */
object AudioDecode {

  final case class AudioRecord(media_id: Long, payload: Array[Byte])
  final case class WindowEnergy(media_id: Long, win: Int, sum_sq: Long,
      n_samples: Long, sample_rate: Int, real_decode: Boolean)

  val SampleRate = 8000
  val NSamples = 256
  val Window = 64

  /** The closed-form PCM sample — the contract the oracle replays. */
  def sample(id: Long, i: Int): Int =
    (((id * 131 + i * 17) % 2003) - 1001).toInt

  object SyntheticAudio {
    /** 16-bit little-endian mono PCM in a REAL WAV container. */
    def wav(id: Long): Array[Byte] = {
      val pcm = new Array[Byte](NSamples * 2)
      var i = 0
      while (i < NSamples) {
        val v = sample(id, i)
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, NSamples.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Decode each WAV through the real parser and emit exact integer
    * window energies. `real_decode` certifies the parsed header matched
    * the expected format AND the full frame count came back.
    */
  def windowEnergy(media: Dataset[AudioRecord]): Dataset[WindowEnergy] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val ais = AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(r.payload))
        val f = ais.getFormat
        val headerOk = f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
          !f.isBigEndian
        val bytes = ais.readAllBytes()
        ais.close()
        val n = bytes.length / 2
        (0 until (n + Window - 1) / Window).map { w =>
          var ss = 0L
          var cnt = 0L
          var i = w * Window
          val end = math.min(n, (w + 1) * Window)
          while (i < end) {
            val v = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
            ss += v.toLong * v
            cnt += 1
            i += 1
          }
          WindowEnergy(r.media_id, w, ss, cnt, f.getSampleRate.toInt,
            headerOk && n == NSamples)
        }
      }
    }
  }
}
