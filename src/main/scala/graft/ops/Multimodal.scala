package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a batched feature-extraction pass.
  *
  * The Spark-side machinery here is real and tested — schema, typed
  * metadata struct, balanced partitioning for the decode pass, and a
  * mapPartitions kernel with the batch shape a native decoder wants. The
  * byte→pixels/samples DECODE ITSELF IS A DETERMINISTIC STUB (this
  * container has no image/audio codecs): [[StubDecoder.decode]] is the
  * clearly-marked plug point where a JNI/FFmpeg/libjpeg call would go.
  *
  * Scale notes: media blobs make row sizes wildly skewed, so the decode
  * pass repartitions by a hash of the id — never range — and the kernel
  * is iterator-to-iterator (no partition-wide materialization), keeping
  * memory at O(1 row). Metadata-only queries never touch the blob column
  * (parquet column pruning), which is the point of splitting metadata out.
  */
object Multimodal {

  /** Feature row produced by the decode pass. */
  case class MediaFeatures(
      media_id: Long,
      byte_len: Int,
      format: String,
      feature: Array[Float])

  /** ======== STUB ========
    * Deterministic fake decoder standing in for a real codec. Derives a
    * fixed-length "feature vector" from the raw bytes (content-dependent,
    * reproducible). Replace the body with the real decode + model forward
    * pass; the surrounding plumbing (batching, partitioning, schema) is
    * production-shaped.
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
    /** Sniff a media "format" from magic bytes (deterministic stub). */
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') "wav"
      else "bin"

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

    /** ======== STUB ======== video frame sampling: real impl would
      * demux and decode every `stride`-th frame. The stub treats the
      * payload as fixed-size pseudo-frames and returns every stride-th
      * slice — the iterator/batch plumbing is what's real.
      */
    def sampleFrames(bytes: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
      bytes.grouped(frameSize).zipWithIndex
        .collect { case (f, i) if i % stride == 0 => f }
        .toSeq
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

  /** Thumbnail row produced by [[resizePass]]. */
  case class MediaThumb(media_id: Long, w: Int, h: Int, thumb: Array[Byte])

  /** Batched resize pass over image payloads (decode kernel stubbed).
    * Same plumbing contract as [[extractFeatures]]: hash-balanced
    * partitions, iterator-to-iterator, blob column pruned everywhere else.
    */
  def resizePass(media: DataFrame, w: Int, h: Int, parallelism: Int): Dataset[MediaThumb] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .where(col("payload").isNotNull)
      .repartition(parallelism, col("media_id"))
      .mapPartitions(_.map { r =>
        MediaThumb(r.getLong(0), w, h, StubDecoder.resize(r.getAs[Array[Byte]](1), w, h))
      })
  }

  /** Sampled-frame row produced by [[frameSamplePass]]. */
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame-sampling pass over video payloads (demux/decode stubbed).
    * One input row fans out to 0..n frame rows — iterator flatMap keeps
    * memory at one frame, and the output is ready for a per-frame
    * feature pass.
    */
  def frameSamplePass(
      media: DataFrame, frameSize: Int, stride: Int, parallelism: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .where(col("payload").isNotNull)
      .repartition(parallelism, col("media_id"))
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        StubDecoder.sampleFrames(r.getAs[Array[Byte]](1), frameSize, stride)
          .iterator.zipWithIndex.map { case (f, i) => MediaFrame(id, i, f) }
      })
  }

  /** Batched decode/feature-extract pass. Hash-repartitions for blob-size
    * balance, then runs the (stubbed) decoder iterator-to-iterator.
    */
  def extractFeatures(media: DataFrame, parallelism: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .where(col("payload").isNotNull) // null blobs: nothing to decode
      .repartition(parallelism, col("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          MediaFeatures(id, bytes.length, StubDecoder.sniffFormat(bytes), StubDecoder.decode(bytes))
        }
      }
  }
}
