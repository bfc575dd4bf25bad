package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batched decode passes.
  *
  * IMAGE decode is REAL ([[ImageCodec]], in-JDK javax.imageio: pixels,
  * stats, bilinear resize), AUDIO decode is REAL ([[AudioCodec]],
  * in-JDK javax.sound.sampled: WAV/PCM to samples), and VIDEO demux is
  * REAL ([[VideoCodec]], pure-JVM RIFF/AVI parsing; MJPG/MPNG frame
  * chunks decode through ImageCodec). Only payloads none of the three
  * codecs recognize fall through to the deterministic byte-stat
  * [[StubDecoder]]; the mapPartitions plumbing is identical everywhere,
  * so swapping in an FFmpeg/JNI call for other codecs touches one
  * function.
  *
  * Scale notes: media blobs make row sizes wildly skewed, so every
  * decode pass repartitions by a hash of the id — never range — and the
  * kernels are iterator-to-iterator (no partition-wide materialization),
  * keeping memory at O(1 row). Metadata-only queries never touch the
  * blob column (parquet column pruning), which is the point of splitting
  * metadata out.
  */
object Multimodal {

  /** Feature row produced by the decode pass. */
  case class MediaFeatures(
      media_id: Long,
      byte_len: Int,
      format: String,
      feature: Array[Float])

  /** ======== STUB (video / unknown formats only) ========
    * Deterministic fake decoder for payloads [[ImageCodec]] and
    * [[AudioCodec]] cannot read. Derives a fixed-length
    * "feature vector" from the raw bytes (content-dependent,
    * reproducible). Replace the body with the real demux/decode call;
    * the surrounding plumbing (batching, partitioning, schema) is
    * production-shaped. Image payloads never reach this path.
    */
  object StubDecoder {
    val featureDim = 8
    def decode(bytes: Array[Byte]): Array[Float] = {
      val f = new Array[Float](featureDim)
      var i = 0
      while (i < bytes.length) {
        f(i % featureDim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }
    /** Sniff a media container from magic bytes (real magic-byte logic,
      * shared by the real decode paths): RIFF files split by subtype
      * fourcc (WAVE → wav, `AVI ` → avi).
      */
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') {
        val sub = if (bytes.length >= 12) new String(bytes, 8, 4, "US-ASCII") else ""
        if (sub == "AVI ") "avi" else if (sub == "WAVE") "wav" else "riff"
      } else "bin"

    /** ======== STUB ======== image resize: real impl would decode,
      * bilinear-resample to (w,h), re-encode. The stub derives a
      * deterministic (w*h)-byte "thumbnail" so batch shape, sizing
      * arithmetic and schema are exercised.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](w * h)
      var i = 0
      while (i < out.length) {
        // Long arithmetic: i * bytes.length overflows Int for ~1 MB payloads
        out(i) = if (bytes.isEmpty) 0 else bytes((i.toLong * bytes.length / out.length).toInt)
        i += 1
      }
      out
    }

  }

  /** Attach an opaque binary payload + typed metadata to a table. In
    * production the binary column arrives from the source (parquet/
    * object-store); here we synthesize it deterministically from a text
    * column so the plumbing is exercisable on the test tables.
    */
  def withBinaryPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        length(col(textCol).cast("binary")).as("byte_len"),
        sha2(col(textCol).cast("binary"), 256).as("content_sha256")
      ).as("meta"))

  /** Hash-balance on media_id when `parallelism > 0`; `parallelism <=
    * 0` trusts the input's existing partitioning (the convention every
    * decode pass follows, so chained passes repartition ONCE — blob
    * rows are the most expensive thing in the pipeline to move).
    */
  private def balanced(media: DataFrame, parallelism: Int): DataFrame =
    if (parallelism > 0) media.repartition(parallelism, col("media_id")) else media

  /** Synthesized image payload: a solid-color PNG whose color and
    * dimensions derive from md5 of a text column — REAL encoded bytes
    * for exercising the decode passes, with analytically-predictable
    * decode results (an oracle can recompute color/dims from the same
    * md5). r,g,b = digest bytes 0..2; w,h = 8 + digest bytes 3,4 mod 9.
    */
  case class MediaPayload(media_id: Long, payload: Array[Byte])

  def syntheticPngPayload(
      df: DataFrame, idCol: String, textCol: String, parallelism: Int): Dataset[MediaPayload] = {
    val spark = df.sparkSession
    import spark.implicits._
    balanced(df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("text"))
      .where(col("text").isNotNull), parallelism)
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val d = md.digest(r.getString(1).getBytes("UTF-8"))
          // OPAQUE pixels (alpha 0xFF): encodePng preserves alpha, and a
          // zero-alpha raster interpolates to nothing in any resampler
          // (premultiplied-alpha arithmetic) — synthetic images model
          // photos, which are opaque
          val rgb = 0xff000000 | ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
          val w = 8 + (d(3) & 0xff) % 9
          val h = 8 + (d(4) & 0xff) % 9
          MediaPayload(r.getLong(0), ImageCodec.encodePng(w, h, Array.fill(w * h)(rgb)))
        }
      }
  }

  /** 8×8 grayscale PNG whose 64 pixel bytes come from an md5 chain of
    * the doc's GROUP key (`id % groupMod`) — so every doc in a group
    * carries the same base image — with variant `v = id div groupMod`
    * perturbing ONE pixel (`(p+128) mod 256` at index `v mod 64`).
    * Exact and near duplicate images therefore exist BY CONSTRUCTION,
    * and every pixel is recomputable from md5 hex in plain SQL, which
    * is what lets an oracle replay the whole perceptual-hash dedup
    * end-to-end (the m2 recipe, extended from stats to dedup).
    */
  def syntheticGrayPngPayload(
      df: DataFrame, idCol: String, groupMod: Int, parallelism: Int): Dataset[MediaPayload] = {
    val spark = df.sparkSession
    import spark.implicits._
    balanced(df.select(col(idCol).cast("long").as("media_id")), parallelism)
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val k = id % groupMod
          val v = id / groupMod
          val px = new Array[Int](64)
          var j = 0
          while (j < 4) {
            val dg = md.digest(s"gray:$k:$j".getBytes("UTF-8"))
            var i = 0
            while (i < 16) { px(j * 16 + i) = dg(i) & 0xff; i += 1 }
            j += 1
          }
          if (v > 0) {
            val i = (v % 64).toInt
            px(i) = (px(i) + 128) % 256
          }
          val argb = px.map(p => 0xff000000 | (p << 16) | (p << 8) | p)
          MediaPayload(id, ImageCodec.encodePng(8, 8, argb))
        }
      }
  }

  /** Average-hash (aHash) perceptual fingerprint over a REAL decode:
    * bit i set iff pixel i is at or above the image mean, compared in
    * integers (`64·p_i ≥ Σp` — never a double mean). The standard
    * cheap perceptual hash; pairs within a hamming radius are near-
    * duplicate images. Payloads are expected 8×8 already (the general
    * flow resizes first — [[Multimodal.resizePass]]); undecodable or
    * wrong-size payloads drop.
    */
  case class ImageHash(media_id: Long, ahash: Long)

  def aHash64(media: DataFrame, parallelism: Int): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    balanced(media.select(col("media_id"), col("payload"))
      .where(col("payload").isNotNull), parallelism)
      .mapPartitions(_.flatMap { r =>
        ImageCodec.decode(r.getAs[Array[Byte]](1)) match {
          case Some(d) if d.width == 8 && d.height == 8 =>
            val gray = d.pixels.map(p => (p >> 16) & 0xff) // r==g==b for gray
            val tot = gray.sum
            var hash = 0L
            var i = 0
            while (i < 64) {
              if (64L * gray(i) >= tot) hash |= (1L << i)
              i += 1
            }
            Some(ImageHash(r.getLong(0), hash))
          case _ => None
        }
      })
  }

  /** Decoded image statistics — REAL javax.imageio decode. Rows whose
    * payload is not a decodable image get format "bin" and null stats.
    */
  case class ImageStats(
      media_id: Long, format: String,
      width: Option[Int], height: Option[Int],
      mean_r: Option[Double], mean_g: Option[Double], mean_b: Option[Double])

  def imageStats(media: DataFrame, parallelism: Int): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    balanced(media.select(col("media_id"), col("payload"))
      .where(col("payload").isNotNull), parallelism)
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        ImageCodec.decode(bytes) match {
          case Some(d) =>
            val (mr, mg, mb) = ImageCodec.channelMeans(d)
            ImageStats(id, sniffImageFormat(bytes), Some(d.width), Some(d.height),
              Some(mr), Some(mg), Some(mb))
          case None =>
            ImageStats(id, "bin", None, None, None, None, None)
        }
      })
  }

  /** Synthesized audio payload: a mono PCM-16 square wave whose
    * amplitude, length, and sample rate derive from md5 of a text
    * column — REAL RIFF/WAVE bytes with analytically-predictable decode
    * results (RMS of a ±A square wave is exactly A). amplitude = 127 ·
    * (1 + digest byte 5), max 32512 < Short.MaxValue; n_samples = 400 + 2·(digest byte 6); rate =
    * 8000 + 1000·(digest byte 7 mod 8).
    */
  def syntheticWavPayload(
      df: DataFrame, idCol: String, textCol: String, parallelism: Int): Dataset[MediaPayload] = {
    val spark = df.sparkSession
    import spark.implicits._
    balanced(df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("text"))
      .where(col("text").isNotNull), parallelism)
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val d = md.digest(r.getString(1).getBytes("UTF-8"))
          val amp = (127 * (1 + (d(5) & 0xff))).toShort // ≤ 32512: never overflows Short
          val n = 400 + 2 * (d(6) & 0xff)
          val rate = 8000 + 1000 * ((d(7) & 0xff) % 8)
          val samples = Array.tabulate(n)(i => if (i % 2 == 0) amp else (-amp).toShort)
          MediaPayload(r.getLong(0), AudioCodec.encodeWavPcm16(rate, samples))
        }
      }
  }

  /** Step-wave WAV whose 64 segment amplitudes come from an md5 chain of
    * the doc's GROUP key, variant `id div groupMod` perturbing ONE
    * segment — the audio sibling of [[syntheticGrayPngPayload]]: near-
    * duplicate CLIPS exist by construction, every amplitude replays from
    * md5 hex in SQL, and the payload is REAL RIFF/WAVE bytes (PCM-16 is
    * lossless, so decode returns the exact levels).
    * Segment i holds `samplesPerSeg` constant samples at level
    * `byte_i · 128 + 64` (never zero, ≤ 32704 < Short.MaxValue).
    */
  def syntheticStepWavPayload(
      df: DataFrame, idCol: String, groupMod: Int, parallelism: Int): Dataset[MediaPayload] = {
    val spark = df.sparkSession
    import spark.implicits._
    val samplesPerSeg = 25
    balanced(df.select(col(idCol).cast("long").as("media_id")), parallelism)
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val k = id % groupMod
          val v = id / groupMod
          val lvl = new Array[Int](64)
          var j = 0
          while (j < 4) {
            val dg = md.digest(s"wav:$k:$j".getBytes("UTF-8"))
            var i = 0
            while (i < 16) { lvl(j * 16 + i) = dg(i) & 0xff; i += 1 }
            j += 1
          }
          if (v > 0) {
            val i = (v % 64).toInt
            lvl(i) = (lvl(i) + 128) % 256
          }
          val samples = new Array[Short](64 * samplesPerSeg)
          var s = 0
          while (s < samples.length) {
            samples(s) = (lvl(s / samplesPerSeg) * 128 + 64).toShort
            s += 1
          }
          MediaPayload(id, AudioCodec.encodeWavPcm16(8000, samples))
        }
      }
  }

  /** Audio fingerprint over a REAL decode — the clip-level analogue of
    * [[aHash64]]: the decoded samples split into 64 equal segments, and
    * bit i is set iff segment i's exact integer sample SUM is at or
    * above the clip mean (`64·sum_i ≥ Σ` — integers throughout; PCM-16
    * decode is lossless so no tolerance is needed). Clips within a
    * hamming radius are near-duplicate audio; pairing shares
    * `Dedup.hammingNearDupPairs` with text simhash and image aHash.
    * Clips whose length isn't divisible by 64 drop (the general flow
    * resamples first).
    */
  def audioHash64(media: DataFrame, parallelism: Int): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    balanced(media.select(col("media_id"), col("payload"))
      .where(col("payload").isNotNull), parallelism)
      .mapPartitions(_.flatMap { r =>
        AudioCodec.decode(r.getAs[Array[Byte]](1)) match {
          case Some(pcm) if pcm.samples.length % 64 == 0 && pcm.samples.nonEmpty =>
            val seg = pcm.samples.length / 64
            val sums = new Array[Long](64)
            var i = 0
            while (i < pcm.samples.length) {
              sums(i / seg) += pcm.samples(i)
              i += 1
            }
            val tot = sums.sum
            var hash = 0L
            var b = 0
            while (b < 64) {
              if (64L * sums(b) >= tot) hash |= (1L << b)
              b += 1
            }
            Some(ImageHash(r.getLong(0), hash))
          case _ => None
        }
      })
  }

  /** Synthesized video payload: a REAL RIFF/AVI container (MPNG codec —
    * motion-PNG, each `00dc` chunk one standalone PNG) whose frame
    * count, dimensions, and per-frame solid colors derive from md5 of a
    * text column, so an external oracle recomputes every decoded value
    * arithmetically. Dims reuse the image derivation (w,h from digest
    * bytes 3,4); n_frames = 2 + digest byte 8 mod 4; frame i color
    * r,g,b = (digest bytes 0,1,2 + i·(1,2,3)) mod 256. PNG frames are
    * lossless, so decoded channel means equal the synthesized colors
    * EXACTLY — the property the oracle hash-match needs (JPEG frames
    * would decode ±2 through quantization; the demux path is identical,
    * see the MJPG round-trip spec).
    */
  def syntheticAviPayload(
      df: DataFrame, idCol: String, textCol: String, parallelism: Int): Dataset[MediaPayload] = {
    val spark = df.sparkSession
    import spark.implicits._
    balanced(df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("text"))
      .where(col("text").isNotNull), parallelism)
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val d = md.digest(r.getString(1).getBytes("UTF-8"))
          val w = 8 + (d(3) & 0xff) % 9
          val h = 8 + (d(4) & 0xff) % 9
          val nFrames = 2 + (d(8) & 0xff) % 4
          val frames = (0 until nFrames).map { i =>
            // opaque, like the image payloads — see syntheticPngPayload
            val rgb = 0xff000000 |
              ((((d(0) & 0xff) + i) % 256) << 16) |
              ((((d(1) & 0xff) + 2 * i) % 256) << 8) |
              (((d(2) & 0xff) + 3 * i) % 256)
            ImageCodec.encodePng(w, h, Array.fill(w * h)(rgb))
          }
          MediaPayload(r.getLong(0), VideoCodec.muxAvi(w, h, 12, "MPNG", frames))
        }
      }
  }

  /** Per-frame decoded video statistics — REAL demux
    * ([[VideoCodec.demuxAvi]]) + REAL per-frame image decode
    * ([[ImageCodec]]). One row per frame; payloads that are not a
    * well-formed AVI produce no rows (they belong to the image/audio
    * passes). Iterator flatMap: memory stays at one decoded frame.
    */
  case class VideoFrameStats(
      media_id: Long, frame_idx: Int,
      width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  def videoFrameStats(media: DataFrame, parallelism: Int): Dataset[VideoFrameStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    balanced(media.select(col("media_id"), col("payload"))
      .where(col("payload").isNotNull), parallelism)
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        VideoCodec.demuxAvi(r.getAs[Array[Byte]](1)).iterator.flatMap { stream =>
          stream.frames.iterator.zipWithIndex.flatMap { case (frame, i) =>
            ImageCodec.decode(frame).map { dec =>
              val (mr, mg, mb) = ImageCodec.channelMeans(dec)
              VideoFrameStats(id, i, dec.width, dec.height, mr, mg, mb)
            }
          }
        }
      })
  }

  /** Decoded audio statistics — REAL javax.sound.sampled decode. */
  case class AudioStats(
      media_id: Long, format: String,
      sample_rate: Option[Int], n_samples: Option[Long], rms: Option[Double])

  def audioStats(media: DataFrame, parallelism: Int): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    balanced(media.select(col("media_id"), col("payload"))
      .where(col("payload").isNotNull), parallelism)
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        AudioCodec.decode(bytes) match {
          case Some(p) =>
            AudioStats(id, StubDecoder.sniffFormat(bytes),
              Some(p.sampleRate), Some(p.samples.length.toLong), Some(AudioCodec.rms(p.samples)))
          case None =>
            AudioStats(id, StubDecoder.sniffFormat(bytes), None, None, None)
        }
      })
  }

  /** Image container from magic bytes (decode-independent). Covers the
    * full ImageIO-decodable set ([[ImageCodec.decode]]): PNG, JPEG, GIF,
    * BMP — a payload that decodes must never be labeled "bin".
    */
  private def sniffImageFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8') "gif"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else "bin"

  /** Thumbnail row produced by [[resizePass]]. */
  case class MediaThumb(media_id: Long, w: Int, h: Int, thumb: Array[Byte])

  /** Batched resize pass: REAL bilinear resize + PNG re-encode for
    * decodable images ([[ImageCodec.resize]]); the deterministic stub
    * handles non-image payloads. Same plumbing contract as
    * [[extractFeatures]]: hash-balanced partitions,
    * iterator-to-iterator, blob column pruned everywhere else.
    */
  def resizePass(media: DataFrame, w: Int, h: Int, parallelism: Int): Dataset[MediaThumb] = {
    val spark = media.sparkSession
    import spark.implicits._
    balanced(media.select(col("media_id"), col("payload"))
      .where(col("payload").isNotNull), parallelism)
      .mapPartitions(_.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val out = ImageCodec.resize(bytes, w, h).getOrElse(StubDecoder.resize(bytes, w, h))
        MediaThumb(r.getLong(0), w, h, out)
      })
  }

  /** Sampled-frame row produced by [[frameSamplePass]]. */
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame-sampling pass over video payloads: AVI containers demux for
    * REAL ([[VideoCodec.demuxAvi]] — every `stride`-th encoded frame
    * chunk is emitted, `frame_idx` = its index IN THE STREAM); payloads
    * no codec recognizes fall back to the deterministic byte-slice stub
    * (`frameSize`-byte pseudo-frames). One input row fans out to 0..n
    * frame rows — iterator flatMap keeps memory at one frame, and the
    * output is ready for a per-frame decode/feature pass.
    *
    * BREAKING (since the real-demux rewrite): the stub path's `frame_idx`
    * is the PRE-sampling stream position (0, stride, 2·stride, …), not the
    * dense post-sampling index (0, 1, 2, …) it used to be — both branches
    * now agree that `frame_idx` means "position in the stream". Consumers
    * using `frame_idx` as a dense array index must rank by it instead.
    */
  def frameSamplePass(
      media: DataFrame, frameSize: Int, stride: Int, parallelism: Int): Dataset[MediaFrame] = {
    // fail on the driver, not as an ArithmeticException (i % 0) or
    // grouped(0) error repeated across every executor task
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    balanced(media.select(col("media_id"), col("payload"))
      .where(col("payload").isNotNull), parallelism)
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // both branches index by PRE-sampling position (0, stride, 2·stride…)
        // so frame_idx means "position in the stream" regardless of payload
        val frames = VideoCodec.demuxAvi(bytes) match {
          case Some(stream) => stream.frames.iterator
          case None => bytes.grouped(frameSize)
        }
        frames.zipWithIndex
          .collect { case (f, i) if i % stride == 0 => MediaFrame(id, i, f) }
      })
  }

  /** Batched decode/feature-extract pass. Hash-repartitions for blob-size
    * balance, then decodes iterator-to-iterator: images get REAL pixel
    * features (dims, channel means, luma, aspect), audio payloads REAL
    * sample features (rate, length, RMS, channels, duration); only
    * undecodable payloads fall back to the deterministic byte-stat stub.
    */
  def extractFeatures(media: DataFrame, parallelism: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    balanced(media
      .select(col("media_id"), col("payload"))
      .where(col("payload").isNotNull), parallelism) // null blobs: nothing to decode
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          ImageCodec.decode(bytes) match {
            case Some(d) =>
              val (mr, mg, mb) = ImageCodec.channelMeans(d)
              val luma = 0.299 * mr + 0.587 * mg + 0.114 * mb
              MediaFeatures(id, bytes.length, sniffImageFormat(bytes), Array(
                d.width.toFloat, d.height.toFloat,
                (mr / 255.0).toFloat, (mg / 255.0).toFloat, (mb / 255.0).toFloat,
                (luma / 255.0).toFloat,
                d.width.toFloat / d.height.toFloat,
                bytes.length / 1024.0f))
            case None => AudioCodec.decode(bytes) match {
              case Some(p) =>
                MediaFeatures(id, bytes.length, StubDecoder.sniffFormat(bytes), Array(
                  p.sampleRate / 1000.0f, p.samples.length.toFloat,
                  (AudioCodec.rms(p.samples) / 32768.0).toFloat, p.channels.toFloat,
                  p.samples.length.toFloat / math.max(p.sampleRate, 1), 0f, 0f,
                  bytes.length / 1024.0f))
              case None =>
                MediaFeatures(id, bytes.length, StubDecoder.sniffFormat(bytes),
                  StubDecoder.decode(bytes))
            }
          }
        }
      }
  }
}
