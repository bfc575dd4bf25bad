package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Real video CONTAINER codec: AVI (RIFF) demux and mux, pure JVM.
  *
  * AVI is the classic motion-JPEG container: a RIFF tree holding an
  * `hdrl` header list (avih + one `strl` per stream) and a `movi` list
  * whose `00dc`/`00db` chunks each carry one complete encoded frame.
  * For the MJPG/MPNG codecs every frame chunk is a standalone
  * JPEG/PNG, which [[ImageCodec]] (javax.imageio) decodes — so demux +
  * per-frame decode is a REAL video path with no native dependencies.
  * Format reference: the public msdn AVI RIFF spec (fmt chunks `avih`
  * 56 bytes, `strh` 56 bytes, `strf` = BITMAPINFOHEADER 40 bytes).
  *
  * The demuxer is codec-agnostic (it returns raw frame chunks); the
  * muxer writes a standards-shaped file: RIFF sizes, even-byte chunk
  * padding, stream header, and an `idx1` keyframe index — enough for
  * third-party players to read what we write.
  *
  * Driver-side synthesis + executor-side demux mirror the PNG/WAV
  * pattern: [[Multimodal.syntheticAviPayload]] derives frames from
  * md5(text) so an external oracle can recompute every decoded value.
  */
object VideoCodec {

  /** One demuxed video stream: container metadata plus the raw encoded
    * frame payloads in presentation order.
    */
  final case class AviStream(
      width: Int,
      height: Int,
      fps: Int,
      fourcc: String,
      frames: Vector[Array[Byte]])

  // ------------------------------------------------------------------ mux

  private def fcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  private def u32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()

  private def u16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()

  /** id + size + body, padded to an even byte boundary (RIFF rule). */
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + 9)
    out.write(fcc(id)); out.write(u32(body.length.toLong)); out.write(body)
    if ((body.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  private def list(kind: String, body: Array[Byte]): Array[Byte] = {
    val inner = new ByteArrayOutputStream(body.length + 4)
    inner.write(fcc(kind)); inner.write(body)
    chunk("LIST", inner.toByteArray)
  }

  /** Mux encoded frames into a single-video-stream AVI. Each element of
    * `frames` must be one complete encoded picture (e.g. a JPEG for
    * fourcc "MJPG", a PNG for "MPNG").
    */
  def muxAvi(
      width: Int,
      height: Int,
      fps: Int,
      fourcc: String,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max

    val avih = new ByteArrayOutputStream(56)
    avih.write(u32(1000000L / fps))      // dwMicroSecPerFrame
    avih.write(u32(maxFrame.toLong * fps)) // dwMaxBytesPerSec
    avih.write(u32(0))                   // dwPaddingGranularity
    avih.write(u32(0x10))                // dwFlags: AVIF_HASINDEX
    avih.write(u32(frames.length.toLong)) // dwTotalFrames
    avih.write(u32(0))                   // dwInitialFrames
    avih.write(u32(1))                   // dwStreams
    avih.write(u32(maxFrame.toLong))     // dwSuggestedBufferSize
    avih.write(u32(width.toLong))
    avih.write(u32(height.toLong))
    (0 until 4).foreach(_ => avih.write(u32(0))) // dwReserved

    val strh = new ByteArrayOutputStream(56)
    strh.write(fcc("vids"))
    strh.write(fcc(fourcc))
    strh.write(u32(0)); strh.write(u16(0)); strh.write(u16(0)) // flags, prio, language
    strh.write(u32(0))                   // dwInitialFrames
    strh.write(u32(1))                   // dwScale
    strh.write(u32(fps.toLong))          // dwRate (fps = rate/scale)
    strh.write(u32(0))                   // dwStart
    strh.write(u32(frames.length.toLong)) // dwLength
    strh.write(u32(maxFrame.toLong))     // dwSuggestedBufferSize
    strh.write(u32(0xFFFFFFFFL))         // dwQuality (default)
    strh.write(u32(0))                   // dwSampleSize (0: one sample per chunk)
    Seq(0, 0, width, height).foreach(v => strh.write(u16(v))) // rcFrame

    val strf = new ByteArrayOutputStream(40)
    strf.write(u32(40))                  // biSize
    strf.write(u32(width.toLong))
    strf.write(u32(height.toLong))
    strf.write(u16(1))                   // biPlanes
    strf.write(u16(24))                  // biBitCount
    strf.write(fcc(fourcc))              // biCompression
    strf.write(u32(width.toLong * height * 3)) // biSizeImage
    (0 until 4).foreach(_ => strf.write(u32(0))) // ppm/clr fields

    val strl = list("strl",
      chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)

    val moviBody = new ByteArrayOutputStream()
    val offsets = frames.map { f =>
      val off = moviBody.size() + 4 // offset measured from the 'movi' fourcc
      moviBody.write(chunk("00dc", f))
      off
    }
    val movi = list("movi", moviBody.toByteArray)

    val idx = new ByteArrayOutputStream(16 * frames.length)
    frames.zip(offsets).foreach { case (f, off) =>
      idx.write(fcc("00dc"))
      idx.write(u32(0x10))               // AVIIF_KEYFRAME
      idx.write(u32(off.toLong))
      idx.write(u32(f.length.toLong))
    }
    val idx1 = chunk("idx1", idx.toByteArray)

    val payload = new ByteArrayOutputStream()
    payload.write(fcc("AVI ")); payload.write(hdrl); payload.write(movi); payload.write(idx1)
    chunk("RIFF", payload.toByteArray)
  }

  // ---------------------------------------------------------------- demux

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def remaining: Int = bytes.length - pos
    def fourcc(): String = {
      val s = new String(bytes, pos, 4, "US-ASCII"); pos += 4; s
    }
    def u32(): Long = {
      val v = ByteBuffer.wrap(bytes, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL
      pos += 4
      v
    }
    def slice(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; out
    }
    def skip(n: Int): Unit = pos += n
  }

  /** Demux a single-video-stream AVI. Returns None for payloads that are
    * not a well-formed RIFF/AVI (callers fall back to the non-video
    * path). Frame chunks `##dc`/`##db` of the FIRST video stream are
    * returned raw, in file order; nested `rec ` grouping lists are
    * descended into.
    */
  def demuxAvi(bytes: Array[Byte]): Option[AviStream] =
    try {
      if (bytes.length < 12) return None
      val r = new Reader(bytes)
      if (r.fourcc() != "RIFF") return None
      val riffSize = r.u32()
      if (riffSize + 8 > bytes.length) return None
      if (r.fourcc() != "AVI ") return None

      var width = 0
      var height = 0
      var fps = 0
      var codec = ""
      // stream index of the first `vids` strl, in hdrl declaration order —
      // frame chunk ids are "{NN}dc"/"{NN}db" where NN is that index, so an
      // AVI listing audio first (video = stream 01) still demuxes its video
      var strhSeen = 0
      var videoStream = -1
      val frames = Vector.newBuilder[Array[Byte]]

      def walk(end: Int, inMovi: Boolean): Unit = {
        while (r.pos + 8 <= end) {
          val id = r.fourcc()
          val size = r.u32()
          // size is unsigned 32-bit: bound it as a Long BEFORE any .toInt —
          // a crafted size >= 2^31 narrows negative, putting `next` at or
          // before this header and looping the walk forever
          if (size > (end - r.pos).toLong)
            throw new IllegalArgumentException("chunk overruns parent")
          val sz = size.toInt
          // pad byte may be absent only when the chunk ends flush with its
          // parent; next >= r.pos so the walk always moves forward
          val next = math.min(end, r.pos + sz + (sz & 1))
          id match {
            case "LIST" =>
              val kind = r.fourcc()
              walk(next, inMovi || kind == "movi")
            case "avih" =>
              val a = new Reader(r.slice(sz))
              val usPerFrame = a.u32()
              a.skip(28)
              width = a.u32().toInt
              height = a.u32().toInt
              if (fps == 0 && usPerFrame > 0) fps = (1000000L / usPerFrame).toInt
            case "strh" =>
              val s = new Reader(r.slice(sz))
              val typ = s.fourcc()
              val handler = s.fourcc()
              if (typ == "vids" && videoStream < 0) {
                videoStream = strhSeen
                codec = handler
                s.skip(12)
                val scale = s.u32()
                val rate = s.u32()
                if (scale > 0 && rate > 0) fps = (rate / scale).toInt
              }
              strhSeen += 1
            case f if inMovi && f.length == 4 &&
                (f.endsWith("dc") || f.endsWith("db")) && f.take(2).forall(_.isDigit) =>
              val target = if (videoStream < 0) 0 else videoStream
              if (f.take(2).toInt == target) frames += r.slice(sz)
              else r.skip(sz)
            case _ =>
              r.skip(sz)
          }
          r.pos = next
        }
      }
      walk(math.min(bytes.length, 8 + riffSize.toInt), inMovi = false)
      Some(AviStream(width, height, fps, codec, frames.result()))
    } catch { case _: Exception => None }
}
