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
    *
    * Hot path: standards-conformant RIFF/WAVE PCM-16 payloads (including
    * everything [[encodeWavPcm16]] emits) are parsed directly with
    * byte-buffer arithmetic. `AudioSystem.getAudioInputStream` resolves
    * its `AudioFileReader` providers on EVERY call (`JDK13Services
    * .getProviders` — a synchronized ServiceLoader scan), which thread
    * dumps showed as the dominant per-row cost of a 32-way parallel
    * decode pass (m7's candidate join re-decoded 5k clips with every
    * task thread serialized behind that lock). The direct parser walks
    * the chunk list (word-aligned), takes the first fmt/data chunks, and
    * yields exactly the samples the AudioSystem path yields for the same
    * bytes; anything non-canonical (non-PCM, compressed, truncated, or a
    * different container) falls back to the generic provider path, so
    * the accepted format surface is unchanged.
    */
  def decode(bytes: Array[Byte]): Option[Pcm] = {
    val fast = decodeCanonicalWavPcm16(bytes)
    if (fast.isDefined) fast else decodeViaProviders(bytes)
  }

  /** RIFF/WAVE PCM-16 direct parse; None for anything else (the caller
    * falls back to the provider path — never a narrowed format surface).
    */
  private def decodeCanonicalWavPcm16(bytes: Array[Byte]): Option[Pcm] =
    try {
      if (bytes.length < 44) return None
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var sampleRate = 0
      var channels = 0
      var fmtOk = false
      var dataOff = -1
      var dataLen = 0
      while (off + 8 <= bytes.length && (!fmtOk || dataOff < 0)) {
        val id = tag(off)
        val len = bb.getInt(off + 4)
        if (len < 0 || off + 8 + len > bytes.length) return None
        if (id == "fmt ") {
          if (len < 16) return None
          val audioFormat = bb.getShort(off + 8)
          channels = bb.getShort(off + 10)
          sampleRate = bb.getInt(off + 12)
          val bits = bb.getShort(off + 22)
          // only uncompressed PCM-16 takes the fast path
          if (audioFormat != 1 || bits != 16 || channels < 1 || sampleRate <= 0)
            return None
          fmtOk = true
        } else if (id == "data" && dataOff < 0) {
          dataOff = off + 8
          dataLen = len
        }
        off += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
      if (!fmtOk || dataOff < 0) return None
      // the provider path reads whole FRAMES (channels x 2 bytes) — floor
      // a malformed trailing partial frame the same way for exact parity
      val frame = channels * 2
      dataLen -= dataLen % frame
      val samples = new Array[Short](dataLen / 2)
      var i = 0
      var p = dataOff
      while (i < samples.length) { samples(i) = bb.getShort(p); i += 1; p += 2 }
      Some(Pcm(sampleRate, channels, samples))
    } catch { case _: Exception => None }

  private def decodeViaProviders(bytes: Array[Byte]): Option[Pcm] =
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
