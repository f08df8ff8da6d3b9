package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The lock-free WAV codec vs the JDK reference implementation.
  *
  * [[Multimodal.wavBytes]] / [[Multimodal.RiffWavDecoder]] replace
  * `AudioSystem` on the hot path because its synchronized provider
  * registry serializes 32 decode threads to single-thread throughput
  * (MediaFloors: 0.99× speedup at 32 threads). These pins keep the swap
  * honest: the bytes we write ARE the bytes the JDK writes, and the
  * features we decode ARE the features the JDK decodes — from both
  * encoders' output.
  */
class RiffWavSpec extends AnyFunSuite {

  private val sampleIds =
    (1L to 200L) ++ Seq(0L, 799L, 1000L, 12345L, 999999L)

  test("hand-rolled WAV bytes are byte-identical to AudioSystem.write") {
    for (id <- sampleIds) {
      val manual = Multimodal.wavBytesForId(id)
      // reference encode through javax.sound on the same PCM
      val rate = (8000 + (id % 8) * 1000).toInt
      val n = (400 + (id % 100) * 20).toInt
      val amp = (1000 + (id % 30) * 500).toInt
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = if ((i / 8) % 2 == 0) amp else -amp
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val ref = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, ref)
      assert(java.util.Arrays.equals(manual, ref.toByteArray),
        s"id=$id: manual WAV differs from AudioSystem.write")
    }
  }

  test("RiffWavDecoder features == JavaSoundDecoder features") {
    for (id <- sampleIds) {
      val wav = Multimodal.wavBytesForId(id)
      assert(Multimodal.RiffWavDecoder.decodeAudio(wav) ===
        Multimodal.JavaSoundDecoder.decodeAudio(wav), s"id=$id")
    }
  }

  test("RiffWavDecoder rejects torn and non-PCM payloads loudly") {
    val wav = Multimodal.wavBytesForId(7L)
    intercept[IllegalArgumentException] {
      Multimodal.RiffWavDecoder.decodeAudio(wav.take(30)) // torn data chunk
    }
    intercept[IllegalArgumentException] {
      Multimodal.RiffWavDecoder.decodeAudio("nope".getBytes ++ wav.drop(4))
    }
    val stereo = wav.clone() // flip the channel-count field in fmt
    stereo(22) = 2
    intercept[IllegalArgumentException] {
      Multimodal.RiffWavDecoder.decodeAudio(stereo)
    }
  }

  test("decoder walks chunk order variations the writer never emits") {
    // data before fmt: legal RIFF, exercised only via the walker
    val wav = Multimodal.wavBytesForId(11L)
    val fmtChunk = wav.slice(12, 36)
    val dataChunk = wav.drop(36)
    val reordered = wav.take(12) ++ dataChunk ++ fmtChunk
    assert(Multimodal.RiffWavDecoder.decodeAudio(reordered) ===
      Multimodal.JavaSoundDecoder.decodeAudio(wav))
  }
}
