package graft.tools

import java.io.{ByteArrayInputStream, File}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.operators.Multimodal

/** One-off generator of the committed WAV media fixtures
  * (fixtures/media/audio_NN.wav) — run with
  * `sbt "Test/runMain graft.tools.MakeAudioFixtures"`.
  *
  * Fixture i is Multimodal.audioFrames(i) frames of
  * Multimodal.audioChannels(i)-channel 16-bit little-endian signed PCM
  * at Multimodal.audioRate(i) Hz, with frame f / channel c holding
  * Multimodal.audioSample(i, f, c). PCM in a WAV container is lossless,
  * so a correct decoder must reproduce Σ samples and Σ samples² EXACTLY
  * — the q_media_audio oracle replays the same formula in SQL, making
  * the decode stage hash-checked against ground truth independent of
  * javax.sound.sampled.
  */
object MakeAudioFixtures {
  def main(args: Array[String]): Unit = {
    val dir = new File("fixtures/media")
    dir.mkdirs()
    (0 until Multimodal.AudioFixtureCount).foreach { i =>
      val (rate, ch, frames) =
        (Multimodal.audioRate(i), Multimodal.audioChannels(i), Multimodal.audioFrames(i))
      val pcm = new Array[Byte](frames * ch * 2)
      var k = 0
      for (f <- 0 until frames; c <- 0 until ch) {
        val s = Multimodal.audioSample(i, f, c)
        pcm(k) = (s & 0xff).toByte
        pcm(k + 1) = ((s >> 8) & 0xff).toByte
        k += 2
      }
      val fmt = new AudioFormat(rate.toFloat, 16, ch, true, false)
      val stream = new AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, frames.toLong)
      val out = new File(dir, f"audio_$i%02d.wav")
      AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
      println(s"wrote $out (${out.length} bytes)")
    }
  }
}
