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

  /** Batched decode/feature-extract pass. Hash-repartitions for blob-size
    * balance, then runs the (stubbed) decoder iterator-to-iterator.
    */
  def extractFeatures(media: DataFrame, parallelism: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
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
