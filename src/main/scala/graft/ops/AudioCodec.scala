package graft.ops

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

/** Real audio codec for WAV/PCM on the in-JDK `javax.sound.sampled`
  * stack (public API, no extra dependencies, headless-safe): RIFF/WAVE
  * PCM-16 mono encode and decode to samples. This retires the byte-stat
  * stub for audio payloads; video demux remains the one honest stub
  * (the JDK ships no container/codec support for it).
  */
object AudioCodec {

  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Encode 16-bit little-endian mono PCM as a canonical 44-byte-header
    * RIFF/WAVE file. Deterministic byte output.
    */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode any AudioSystem-supported payload to 16-bit samples. None
    * for undecodable bytes — callers fall back to the non-audio path.
    */
  def decode(bytes: Array[Byte]): Option[Pcm] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val raw = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(raw).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val samples = new Array[Short](raw.length / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort(); i += 1 }
          Some(Pcm(fmt.getSampleRate.toInt, fmt.getChannels, samples))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Root-mean-square amplitude: exact long sum of squares, one sqrt. */
  def rms(samples: Array[Short]): Double = {
    if (samples.isEmpty) return 0.0
    var acc = 0L
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toLong
      acc += s * s
      i += 1
    }
    math.sqrt(acc.toDouble / samples.length)
  }
}
