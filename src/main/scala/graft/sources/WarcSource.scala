package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC source/sink — the web-archive interchange format (ISO 28500)
  * every crawl-derived LLM corpus starts from (Common Crawl ships WARC;
  * C4/RefinedWeb/Dolma all begin by reading it). Records are framed by
  * `Content-Length`, NOT by delimiters, so payloads carry raw CRLFs,
  * binary bytes, even text that LOOKS like a WARC header — the framing
  * is what makes that safe, and the roundtrip gate (src8) injects
  * exactly that adversarial content to pin it.
  *
  * Record shape written and parsed (version line, header lines, blank
  * line, `Content-Length` payload bytes, blank line ×2 — all line
  * breaks CRLF per spec):
  *
  * {{{
  * WARC/1.0
  * WARC-Type: resource
  * WARC-Record-ID: <urn:...>
  * WARC-Target-URI: ...
  * WARC-Date: 2026-01-01T00:00:00Z
  * Content-Type: text/plain
  * Content-Length: N
  *
  * <N payload bytes>
  * }}}
  *
  * Scale contract:
  *   - **Write**: one `.warc` file per partition via the Hadoop
  *     filesystem client (works against HDFS/S3/local the same way);
  *     each file is staged under a dot-name and RENAMED into place so
  *     a retried task never leaves a half-written shard visible.
  *     Shard sizing is the caller's partitioning — the Common Crawl
  *     convention is ~1 GiB per WARC; `repartition` to taste first.
  *   - **Read**: plain `.warc` is NOT line- or block-splittable (the
  *     only way to find record N is to walk lengths from the front),
  *     so the reader takes one task per FILE (`binaryFile` source) —
  *     parallelism comes from file count, which is exactly how CC
  *     consumers run (100k × 1 GiB files, never one big one). Per-task
  *     memory is one shard. (The `.warc.gz` member-per-record variant
  *     that allows sub-file splitting needs a gzip-member scanner;
  *     out of scope here.)
  *   - **Quarantine, not failure**: a malformed region (bad version
  *     line, unparseable or overrunning Content-Length, missing
  *     terminator) becomes one row with the schema fields null and a
  *     bounded snippet in `corrupt`, then the parser RESYNCS at the
  *     next `WARC/1.0\r\n` boundary — one damaged record in a billion
  *     costs one audit row, not a failed job (the JSONL PERMISSIVE
  *     discipline applied to length-framed data).
  *
  * Payloads stay `binary` end to end — decode is the caller's choice
  * (`decode(payload, 'UTF-8')` for text corpora), because WARC payload
  * bytes are frequently NOT valid UTF-8 and an eager decode would
  * corrupt them.
  */
object WarcSource {

  /** Parsed-record schema: WARC headers as typed columns, raw payload
    * bytes, and the quarantine column (`corrupt` null ⇔ well-formed).
    */
  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("payload", BinaryType),
    StructField("corrupt", StringType)))

  private val CRLF = "\r\n".getBytes("US-ASCII")
  private val VERSION = "WARC/1.0\r\n".getBytes("US-ASCII")

  /** Write `df` as WARC, one `part-NNNNN.warc` per non-empty partition.
    * Required columns: `record_id`, `target_uri`, `warc_date`,
    * `content_type` (strings; null ⇒ header omitted, except
    * `record_id` which the spec mandates) and `payload` (binary).
    * Existing `path` contents are replaced (the corpus-export
    * overwrite semantics of the engine's other sinks).
    */
  def write(df: DataFrame, path: String, warcType: String = "resource"): Unit = {
    val spark = df.sparkSession
    val confOf = org.apache.spark.graft.sparkShims
      .hadoopConfSupplier(spark.sparkContext)
    val out = new org.apache.hadoop.fs.Path(path)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    val pathStr = out.toString
    val wt = warcType
    df.select(col("record_id").cast("string"), col("target_uri").cast("string"),
        col("warc_date").cast("string"), col("content_type").cast("string"),
        col("payload").cast("binary"))
      .foreachPartition { rows: Iterator[Row] =>
        if (rows.hasNext) {
          val part = TaskContext.getPartitionId()
          // the staging name carries the TASK ATTEMPT id (the
          // FileOutputCommitter discipline): two live attempts of one
          // partition (speculation, a zombie after stage retry) must
          // never share a tmp file — a shared name lets the zombie
          // truncate the winner mid-write and publish a torn shard.
          // With unique staging, every attempt writes a COMPLETE file
          // and the delete+rename is last-writer-wins between complete
          // files; dot-prefixed leftovers are invisible to the
          // `*.warc`-globbed reader.
          val attempt = TaskContext.get().taskAttemptId()
          val fs = new org.apache.hadoop.fs.Path(pathStr).getFileSystem(confOf())
          val tmp = new org.apache.hadoop.fs.Path(
            pathStr, f".part-$part%05d.attempt-$attempt%d.warc.inprogress")
          val dst = new org.apache.hadoop.fs.Path(pathStr, f"part-$part%05d.warc")
          val os = fs.create(tmp, true)
          try {
            rows.foreach { r =>
              val payload =
                if (r.isNullAt(4)) Array.emptyByteArray else r.getAs[Array[Byte]](4)
              val sb = new StringBuilder("WARC/1.0\r\n")
              sb.append("WARC-Type: ").append(wt).append("\r\n")
              require(!r.isNullAt(0), "record_id is mandatory (WARC spec)")
              sb.append("WARC-Record-ID: ").append(r.getString(0)).append("\r\n")
              if (!r.isNullAt(1)) sb.append("WARC-Target-URI: ").append(r.getString(1)).append("\r\n")
              if (!r.isNullAt(2)) sb.append("WARC-Date: ").append(r.getString(2)).append("\r\n")
              if (!r.isNullAt(3)) sb.append("Content-Type: ").append(r.getString(3)).append("\r\n")
              sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
              os.write(sb.result().getBytes("UTF-8"))
              os.write(payload)
              os.write(CRLF); os.write(CRLF)
            }
          } finally os.close()
          if (fs.exists(dst)) fs.delete(dst, false)
          require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
          // best-effort orphan sweep: attempt-unique staging names are
          // never overwritten by a retry (unlike the old fixed tmp
          // name), so a failed/killed attempt's file would accumulate
          // forever. Deleting a still-live sibling attempt's tmp is
          // safe: that zombie fails its own rename loudly and Spark
          // ignores a failure of an already-succeeded task.
          val orphans = fs.globStatus(new org.apache.hadoop.fs.Path(
            pathStr, f".part-$part%05d.attempt-*.warc.inprogress"))
          if (orphans != null) orphans.foreach { o =>
            try { fs.delete(o.getPath, false); () } catch { case _: Exception => () }
          }
        }
      }
  }

  /** Read a directory of `.warc` files into [[schema]] — one task per
    * file (see the scale contract above), malformed regions quarantined
    * into `corrupt` with resync at the next record boundary.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc").load(path)
      .select(col("content"))
    val rdd = bin.queryExecution.toRdd.mapPartitions { rows =>
      rows.flatMap(r => parseShard(r.getBinary(0)))
    }
    spark.createDataFrame(
      rdd.map(t => Row(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8)), schema)
  }

  private type Rec = (String, String, String, String, String,
    java.lang.Long, Array[Byte], String)

  /** Walk one shard's bytes record by record. Pure function of the
    * byte array — unit-testable without Spark.
    */
  private[sources] def parseShard(bytes: Array[Byte]): Iterator[Rec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var pos = 0
    def corrupt(from: Int, until: Int, why: String): Unit = {
      val snip = new String(bytes, from, math.min(until - from, 160), "UTF-8")
      out += ((null, null, null, null, null, null, null, s"$why: $snip"))
    }
    // index of VERSION in bytes at/after `from`, or -1
    def nextVersion(from: Int): Int = {
      var i = from
      val limit = bytes.length - VERSION.length
      while (i <= limit) {
        var j = 0
        while (j < VERSION.length && bytes(i + j) == VERSION(j)) j += 1
        if (j == VERSION.length) return i
        i += 1
      }
      -1
    }
    def indexOfCrlfCrlf(from: Int): Int = {
      var i = from
      val limit = bytes.length - 4
      while (i <= limit) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
        i += 1
      }
      -1
    }
    while (pos < bytes.length) {
      val at = nextVersion(pos)
      if (at < 0) {
        // trailing bytes with no further record; whitespace-only tails
        // (the inter-record blank lines) are framing, not damage
        if (!new String(bytes, pos, bytes.length - pos, "UTF-8").forall(_.isWhitespace))
          corrupt(pos, bytes.length, "no record boundary")
        pos = bytes.length
      } else {
        if (at > pos &&
          !new String(bytes, pos, at - pos, "UTF-8").forall(_.isWhitespace))
          corrupt(pos, at, "bytes outside record framing")
        val hdrEnd = indexOfCrlfCrlf(at)
        if (hdrEnd < 0) { corrupt(at, bytes.length, "unterminated header"); pos = bytes.length }
        else {
          val hdrs = new String(bytes, at + VERSION.length,
              hdrEnd + 2 - (at + VERSION.length), "UTF-8")
            .split("\r\n").iterator
            .map(_.split(":", 2))
            .collect { case Array(k, v) => k.trim.toLowerCase -> v.trim }
            .toMap
          val bodyAt = hdrEnd + 4
          val lenOpt = hdrs.get("content-length").flatMap(_.toLongOption)
          lenOpt match {
            case Some(n) if n >= 0 && n <= Int.MaxValue - 8 && bodyAt + n <= bytes.length =>
              val payload = java.util.Arrays.copyOfRange(bytes, bodyAt, bodyAt + n.toInt)
              out += ((hdrs.getOrElse("warc-type", null),
                hdrs.getOrElse("warc-record-id", null),
                hdrs.getOrElse("warc-target-uri", null),
                hdrs.getOrElse("warc-date", null),
                hdrs.getOrElse("content-type", null),
                Long.box(n), payload, null))
              pos = bodyAt + n.toInt
            case _ =>
              // quarantine the WHOLE damaged region as one row: from
              // this version line to the next record boundary (or EOF)
              val resync = nextVersion(at + VERSION.length)
              val until = if (resync < 0) bytes.length else resync
              corrupt(at, until, "bad or overrunning Content-Length")
              pos = until
          }
        }
      }
    }
    out.iterator
  }
}
