package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def media = Multimodal.withBinaryPayload(
    Seq((1L, "hello media world"), (2L, "tiny")).toDF("doc_id", "text"),
    "doc_id", "text")

  test("payload + typed metadata schema; metadata stays without the blob") {
    val m = media
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "payload", "meta"))
    val meta = m.select("media_id", "meta.byte_len").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(meta(1L) == 17 && meta(2L) == 4)
  }

  test("feature extraction: deterministic, fixed dim, format sniffed") {
    val f = Multimodal.extractFeatures(media, 2).collect().sortBy(_.media_id)
    assert(f.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(f.forall(_.feature.length == Multimodal.StubDecoder.featureDim))
    assert(f.forall(_.format == "bin"))
    val again = Multimodal.extractFeatures(media, 2).collect().sortBy(_.media_id)
    assert(f.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
  }

  test("resize pass emits fixed-size thumbnails") {
    val t = Multimodal.resizePass(media, 4, 3, 2).collect()
    assert(t.length == 2 && t.forall(_.thumb.length == 12))
  }

  test("frame sampling: every stride-th pseudo-frame, memory-lean fanout") {
    val frames = Multimodal.frameSamplePass(media, frameSize = 4, stride = 2, 2)
      .where(col("media_id") === 1L).collect().sortBy(_.frame_idx)
    // 17 bytes -> 5 frames (4,4,4,4,1) -> sampled idx 0,2,4 -> 3 frames
    assert(frames.length == 3)
    assert(new String(frames.head.frame) == "hell")
    // frame_idx is the PRE-sampling stream position on the stub path too —
    // same semantics as the AVI branch (see frameSamplePass scaladoc)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
  }

  // ---------------------------------------------- real image decode path

  test("PNG encode/decode roundtrip is lossless (real javax.imageio)") {
    val px = Array(0xff0000, 0x00ff00, 0x0000ff, 0x123456, 0xfedcba, 0x000000)
    val bytes = ImageCodec.encodePng(3, 2, px)
    val d = ImageCodec.decode(bytes).get
    assert(d.width == 3 && d.height == 2)
    assert(d.pixels.map(_ & 0xffffff).toSeq == px.toSeq)
  }

  test("PNG round-trip preserves alpha, including semi-transparent pixels") {
    // an RGB-typed encode buffer would force alpha to 0xFF and silently
    // break decode(encodePng(px)) == px for any non-opaque raster
    val px = Array(0x80ff0000, 0xff112233, 0x7f123456, 0xff000000)
    val d = ImageCodec.decode(ImageCodec.encodePng(2, 2, px)).get
    assert(d.pixels.toSeq == px.toSeq)
  }

  test("synthetic PNG payload decodes to md5-derived dims and exact color") {
    val docs = Seq((7L, "hello media world")).toDF("doc_id", "text")
    val payload = Multimodal.syntheticPngPayload(docs, "doc_id", "text", 2).toDF()
    val st = Multimodal.imageStats(payload, 2).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("hello media world".getBytes("UTF-8"))
    assert(st.format == "png")
    assert(st.width.get == 8 + (md(3) & 0xff) % 9)
    assert(st.height.get == 8 + (md(4) & 0xff) % 9)
    assert(st.mean_r.get == (md(0) & 0xff).toDouble) // solid color: exact
    assert(st.mean_g.get == (md(1) & 0xff).toDouble)
    assert(st.mean_b.get == (md(2) & 0xff).toDouble)
  }

  test("resize pass really resamples images: decoded thumb has target dims") {
    val docs = Seq((1L, "resize me")).toDF("doc_id", "text")
    val payload = Multimodal.syntheticPngPayload(docs, "doc_id", "text", 1).toDF()
    val thumb = Multimodal.resizePass(payload, 5, 4, 1).collect().head
    val d = ImageCodec.decode(thumb.thumb).get
    assert(d.width == 5 && d.height == 4)
    // solid-color source -> solid-color thumbnail, bit-exact
    val src = ImageCodec.decode(
      payload.select("payload").head().getAs[Array[Byte]](0)).get
    assert(d.pixels.toSet == src.pixels.toSet && d.pixels.toSet.size == 1)
  }

  test("feature extraction uses real pixel features for images") {
    val docs = Seq((1L, "feature text")).toDF("doc_id", "text")
    val payload = Multimodal.syntheticPngPayload(docs, "doc_id", "text", 1).toDF()
    val f = Multimodal.extractFeatures(payload, 1).collect().head
    val st = Multimodal.imageStats(payload, 1).collect().head
    assert(f.format == "png")
    assert(f.feature(0) == st.width.get.toFloat && f.feature(1) == st.height.get.toFloat)
    assert(math.abs(f.feature(2) - st.mean_r.get / 255.0) < 1e-6)
  }

  test("WAV encode/decode roundtrip is lossless (real javax.sound.sampled)") {
    val samples = Array[Short](100, -100, 32512, -32512, 0, 7)
    val bytes = AudioCodec.encodeWavPcm16(16000, samples)
    val p = AudioCodec.decode(bytes).get
    assert(p.sampleRate == 16000 && p.channels == 1)
    assert(p.samples.toSeq == samples.toSeq)
  }

  test("synthetic WAV payload decodes to md5-derived rate, length, exact RMS") {
    val docs = Seq((5L, "audio sample text")).toDF("doc_id", "text")
    val payload = Multimodal.syntheticWavPayload(docs, "doc_id", "text", 1).toDF()
    val st = Multimodal.audioStats(payload, 1).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("audio sample text".getBytes("UTF-8"))
    assert(st.format == "wav")
    assert(st.sample_rate.get == 8000 + 1000 * ((md(7) & 0xff) % 8))
    assert(st.n_samples.get == 400L + 2 * (md(6) & 0xff))
    assert(st.rms.get == (127 * (1 + (md(5) & 0xff))).toDouble) // square wave: exact
  }

  test("feature extraction uses real sample features for audio") {
    val docs = Seq((9L, "audio feature doc")).toDF("doc_id", "text")
    val payload = Multimodal.syntheticWavPayload(docs, "doc_id", "text", 1).toDF()
    val f = Multimodal.extractFeatures(payload, 1).collect().head
    val st = Multimodal.audioStats(payload, 1).collect().head
    assert(f.format == "wav")
    assert(f.feature(0) == st.sample_rate.get / 1000.0f)
    assert(f.feature(1) == st.n_samples.get.toFloat)
    assert(math.abs(f.feature(2) - st.rms.get / 32768.0) < 1e-6)
  }

  // ---------------------------------------------- real video demux path

  test("AVI mux/demux roundtrip: header fields and byte-exact frame chunks") {
    val frames = Seq(
      ImageCodec.encodePng(6, 4, Array.fill(24)(0xaabbcc)),
      ImageCodec.encodePng(6, 4, Array.fill(24)(0x112233)),
      ImageCodec.encodePng(6, 4, Array.fill(24)(0xff00ff)))
    val avi = VideoCodec.muxAvi(6, 4, 25, "MPNG", frames)
    assert(Multimodal.StubDecoder.sniffFormat(avi) == "avi")
    val s = VideoCodec.demuxAvi(avi).get
    assert(s.width == 6 && s.height == 4 && s.fps == 25 && s.fourcc == "MPNG")
    assert(s.frames.length == 3)
    assert(s.frames.zip(frames).forall { case (a, b) => a.sameElements(b) })
  }

  test("MJPG variant: real JPEG frames decode with real pixel content") {
    // encode genuine JPEGs through ImageIO — the demux/decode path is
    // identical to MPNG; JPEG is lossy so means are checked within the
    // quantization tolerance rather than exactly
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 256).foreach(i => img.setRGB(i % 16, i / 16, 0x808080))
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jout)
    val avi = VideoCodec.muxAvi(16, 16, 30, "MJPG", Seq(jout.toByteArray, jout.toByteArray))
    val s = VideoCodec.demuxAvi(avi).get
    assert(s.fourcc == "MJPG" && s.frames.length == 2)
    val d = ImageCodec.decode(s.frames.head).get
    assert(d.width == 16 && d.height == 16)
    val (mr, mg, mb) = ImageCodec.channelMeans(d)
    assert(math.abs(mr - 128) <= 3 && math.abs(mg - 128) <= 3 && math.abs(mb - 128) <= 3)
  }

  test("AVI chunk padding: odd-length frames roundtrip byte-exact") {
    // RIFF pads odd chunks to even boundaries — the classic demux bug is
    // reading the pad byte into the next chunk id
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6, 7, 8, 9))
    val s = VideoCodec.demuxAvi(VideoCodec.muxAvi(2, 2, 10, "MJPG", frames)).get
    assert(s.frames.length == 3)
    assert(s.frames.zip(frames).forall { case (a, b) => a.sameElements(b) })
  }

  test("AVI with zero frames demuxes to an empty stream, not an error") {
    val s = VideoCodec.demuxAvi(VideoCodec.muxAvi(4, 4, 10, "MPNG", Seq.empty)).get
    assert(s.frames.isEmpty && s.width == 4 && s.height == 4)
  }

  test("demux rejects malformed payloads instead of throwing") {
    assert(VideoCodec.demuxAvi("not a riff file at all".getBytes).isEmpty)
    assert(VideoCodec.demuxAvi(Array[Byte]()).isEmpty)
    // RIFF but not AVI (a WAV) must not demux as video
    val wav = AudioCodec.encodeWavPcm16(8000, Array[Short](1, 2, 3))
    assert(VideoCodec.demuxAvi(wav).isEmpty)
    // truncated AVI: declared sizes overrun the buffer
    val avi = VideoCodec.muxAvi(4, 4, 10, "MPNG",
      Seq(ImageCodec.encodePng(4, 4, Array.fill(16)(0))))
    assert(VideoCodec.demuxAvi(avi.take(avi.length / 2)).isEmpty)
  }

  test("demux terminates on crafted chunk sizes >= 2^31 (no infinite loop)") {
    import java.nio.{ByteBuffer, ByteOrder}
    def u32(v: Long) = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()
    // a size field of 0xFFFFFFF8 narrows to -8: `next` then lands exactly at
    // the chunk header and the walk re-reads it forever unless the size is
    // validated as an unsigned Long first. ~28 bytes is all it takes.
    val body = "AVI ".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ u32(0xFFFFFFF8L) ++ Array.fill[Byte](8)(0)
    val riff = "RIFF".getBytes("US-ASCII") ++ u32(body.length.toLong) ++ body
    assert(VideoCodec.demuxAvi(riff).isEmpty)
    // odd variant: 0xFFFFFFFF narrows to -1, pad bit makes next == pos
    val body2 = "AVI ".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ u32(0xFFFFFFFFL) ++ Array.fill[Byte](8)(0)
    val riff2 = "RIFF".getBytes("US-ASCII") ++ u32(body2.length.toLong) ++ body2
    assert(VideoCodec.demuxAvi(riff2).isEmpty)
  }

  test("audio-listed-first AVI: frames come from the vids stream, not stream 00") {
    import java.nio.{ByteBuffer, ByteOrder}
    def fcc(s: String) = s.getBytes("US-ASCII")
    def u32(v: Long) = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      fcc(id) ++ u32(body.length.toLong) ++ body ++
        (if ((body.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(kind: String, body: Array[Byte]) = chunk("LIST", fcc(kind) ++ body)
    def strhBody(typ: String, handler: String, scale: Int, rate: Int) = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fcc(typ)); b.put(fcc(handler)); b.position(b.position() + 12)
      b.putInt(scale); b.putInt(rate); b.array()
    }
    val avihBody = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(100000); b.position(32); b.putInt(6); b.putInt(2)
      b.array()
    }
    // stream 00 = audio, stream 01 = video: a common third-party layout
    val hdrl = list("hdrl", chunk("avih", avihBody) ++
      list("strl", chunk("strh", strhBody("auds", "NONE", 1, 8000))) ++
      list("strl", chunk("strh", strhBody("vids", "MPNG", 1, 25))))
    val png1 = ImageCodec.encodePng(6, 2, Array.fill(12)(0x102030))
    val png2 = ImageCodec.encodePng(6, 2, Array.fill(12)(0x405060))
    val movi = list("movi",
      chunk("00wb", Array[Byte](1, 2, 3, 4)) ++ // audio data, must be skipped
        chunk("01dc", png1) ++
        chunk("00dc", Array[Byte](9, 9)) ++     // stream-00 chunk: NOT video here
        chunk("01dc", png2))
    val avi = chunk("RIFF", fcc("AVI ") ++ hdrl ++ movi)
    val s = VideoCodec.demuxAvi(avi).get
    assert(s.fourcc == "MPNG" && s.fps == 25 && s.width == 6 && s.height == 2)
    assert(s.frames.length == 2)
    assert(s.frames.head.sameElements(png1) && s.frames(1).sameElements(png2))
    assert(ImageCodec.decode(s.frames.head).get.width == 6)
  }

  test("synthetic AVI payload decodes to md5-derived frames, dims, exact colors") {
    val docs = Seq((3L, "video sample text")).toDF("doc_id", "text")
    val payload = Multimodal.syntheticAviPayload(docs, "doc_id", "text", 1).toDF()
    val st = Multimodal.videoFrameStats(payload, 1).collect().sortBy(_.frame_idx)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("video sample text".getBytes("UTF-8"))
    assert(st.length == 2 + (md(8) & 0xff) % 4)
    st.zipWithIndex.foreach { case (f, i) =>
      assert(f.frame_idx == i)
      assert(f.width == 8 + (md(3) & 0xff) % 9)
      assert(f.height == 8 + (md(4) & 0xff) % 9)
      assert(f.mean_r == ((md(0) & 0xff) + i) % 256)     // PNG frames: exact
      assert(f.mean_g == ((md(1) & 0xff) + 2 * i) % 256)
      assert(f.mean_b == ((md(2) & 0xff) + 3 * i) % 256)
    }
  }

  test("frame sampling really demuxes AVI payloads: stream-indexed stride") {
    val docs = Seq((4L, "stride video doc")).toDF("doc_id", "text")
    val payload = Multimodal.syntheticAviPayload(docs, "doc_id", "text", 1).toDF()
    val all = Multimodal.videoFrameStats(payload, 1).collect()
    val sampled = Multimodal.frameSamplePass(payload, frameSize = 999, stride = 2, 1)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == (0 until all.length by 2).toSeq)
    // sampled frames are the REAL encoded chunks: they decode
    sampled.foreach(f => assert(ImageCodec.decode(f.frame).isDefined))
  }

  test("aHash64: integer-mean bit rule, computed through a REAL PNG roundtrip") {
    // pixels 0..63: mean 31.5, so 64*p >= sum(=2016) iff p >= 31.5 iff p >= 32
    val px = (0 until 64).toArray
    val argb = px.map(p => 0xff000000 | (p << 16) | (p << 8) | p)
    val media = Seq((1L, ImageCodec.encodePng(8, 8, argb))).toDF("media_id", "payload")
    val h = Multimodal.aHash64(media, 1).collect().head.ahash
    val expected = (32 until 64).foldLeft(0L)((acc, i) => acc | (1L << i))
    assert(h == expected, f"$h%016x vs $expected%016x")
    // bit 63 exercises the sign bit: expected is negative
    assert(h < 0L)
  }

  test("aHash64: exact duplicates hash equal; one flipped pixel moves few bits") {
    val base = Array.tabulate(64)(i => (i * 37) % 256)
    def png(p: Array[Int]) =
      ImageCodec.encodePng(8, 8, p.map(v => 0xff000000 | (v << 16) | (v << 8) | v))
    val variant = base.clone(); variant(10) = (variant(10) + 128) % 256
    val media = Seq((1L, png(base)), (2L, png(base)), (3L, png(variant)))
      .toDF("media_id", "payload")
    val hs = Multimodal.aHash64(media, 1).collect().map(h => h.media_id -> h.ahash).toMap
    assert(hs(1L) == hs(2L))
    val d = java.lang.Long.bitCount(hs(1L) ^ hs(3L))
    assert(d >= 1 && d <= 4, s"hamming $d")
    // the pair flow finds exactly the pairs within the radius
    val pairs = Dedup.hammingNearDupPairs(
      Multimodal.aHash64(media, 1).toDF(), "media_id", "ahash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 0)))
  }

  test("aHash64: undecodable and non-8x8 payloads drop") {
    val media = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, ImageCodec.encodePng(4, 4, Array.fill(16)(0xff000000)))
    ).toDF("media_id", "payload")
    assert(Multimodal.aHash64(media, 1).isEmpty)
  }

  test("audioHash64: segment-sum bits through a REAL WAV roundtrip; bad lengths drop") {
    // 64 segments of 2 samples: segments 0..31 low (100), 32..63 high
    // (1000) -> mean sits between, bits = high half exactly
    val samples = Array.tabulate(128)(i => (if (i < 64) 100 else 1000).toShort)
    val media = Seq(
      (1L, AudioCodec.encodeWavPcm16(8000, samples)),
      (2L, AudioCodec.encodeWavPcm16(8000, samples)),            // exact dup
      (3L, AudioCodec.encodeWavPcm16(8000, samples.take(100))),  // 100 % 64 != 0 -> drops
      (4L, Array[Byte](9, 9, 9)))                                 // undecodable
      .toDF("media_id", "payload")
    val hs = Multimodal.audioHash64(media, 1).collect().map(h => h.media_id -> h.ahash).toMap
    assert(hs.keySet == Set(1L, 2L))
    val expected = (32 until 64).foldLeft(0L)((acc, i) => acc | (1L << i))
    assert(hs(1L) == expected, f"${hs(1L)}%016x")
    assert(hs(1L) == hs(2L))
  }
}
