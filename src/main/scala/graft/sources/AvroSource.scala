package graft.sources

import java.io.ByteArrayInputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro object-container source/sink — the row-oriented interchange
  * format of the Kafka/schema-registry world (and the classic landing
  * format for event streams before they become parquet). Built directly
  * on the Avro 1.12 container library: schema embedded per file,
  * deflate-compressed blocks, typed nullable unions — a real container
  * any `avro-tools`/Kafka-Connect consumer can read, not a bespoke
  * framing.
  *
  * Column-type contract: flat schemas of long / int / double / boolean
  * / string / binary ONLY, nullable as `union {null, T}`. Anything else
  * (decimal, timestamp, nested) must be cast/serialized by the caller
  * first — an implicit lossy coercion here would be the silent-overflow
  * bug src9 exists to refuse.
  *
  * Scale contract (the src8/src10 discipline):
  *   - **Write**: one `.avro` file per non-empty partition through the
  *     Hadoop FS client, staged under a dot-name and renamed so a
  *     retried task never leaves a half shard visible. Shard sizing is
  *     the caller's partitioning.
  *   - **Read**: one task per file (`binaryFile`). The container format
  *     itself IS block-splittable via sync markers — a production
  *     cluster with the spark-avro connector would split inside files;
  *     this reader's parallelism is file count, which matches the
  *     write-side one-file-per-partition sharding exactly (the src10
  *     gzip-JSONL contract).
  *   - **Integrity over quarantine**: a corrupt container fails the
  *     task loudly. Unlike wild-web WARC, Avro is a warehouse
  *     interchange format — a damaged shard means a broken producer or
  *     transfer, and resuming past it would silently drop a block of
  *     rows that the schema registry says exist.
  */
object AvroSource {

  /** Build the embedded Avro schema from a flat Spark schema. */
  private[sources] def avroSchema(st: StructType): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { sf =>
      val base = sf.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"unsupported Avro column type ${sf.name}: $other — cast to " +
            "long/int/double/boolean/string/binary first")
      }
      val sch =
        if (sf.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      fields.add(new Schema.Field(sf.name, sch, null, null))
    }
    Schema.createRecord("row", null, "graft", false, fields)
  }

  /** Write `df` as Avro, one `part-NNNNN.avro` per non-empty partition.
    * Existing `path` contents are replaced (the engine's corpus-export
    * overwrite semantics).
    */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val confOf = org.apache.spark.graft.sparkShims
      .hadoopConfSupplier(spark.sparkContext)
    val out = new org.apache.hadoop.fs.Path(path)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    val pathStr = out.toString
    val schemaJson = avroSchema(df.schema).toString
    val n = df.schema.length
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val part = TaskContext.getPartitionId()
        // attempt-unique staging (the WarcSource.write rationale):
        // concurrent attempts of one partition never share a tmp file,
        // so the published shard is always a complete file
        val attempt = TaskContext.get().taskAttemptId()
        val fs = new org.apache.hadoop.fs.Path(pathStr).getFileSystem(confOf())
        val tmp = new org.apache.hadoop.fs.Path(
          pathStr, f".part-$part%05d.attempt-$attempt%d.avro.inprogress")
        val dst = new org.apache.hadoop.fs.Path(pathStr, f"part-$part%05d.avro")
        val os = fs.create(tmp, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.setCodec(CodecFactory.deflateCodec(6))
        writer.create(schema, os) // closes os via writer.close()
        try {
          rows.foreach { r =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < n) {
              val v = r.get(i) match {
                case null              => null
                case b: Array[Byte]    => ByteBuffer.wrap(b)
                case other             => other
              }
              rec.put(i, v)
              i += 1
            }
            writer.append(rec)
          }
        } finally writer.close()
        if (fs.exists(dst)) fs.delete(dst, false)
        require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
        // best-effort orphan sweep (the WarcSource.write rationale):
        // attempt-unique staging files from failed/killed attempts
        // would otherwise accumulate in the output dir forever
        val orphans = fs.globStatus(new org.apache.hadoop.fs.Path(
          pathStr, f".part-$part%05d.attempt-*.avro.inprogress"))
        if (orphans != null) orphans.foreach { o =>
          try { fs.delete(o.getPath, false); () } catch { case _: Exception => () }
        }
      }
    }
  }

  /** Read a directory of `.avro` files into `schema` — one task per
    * file (see the scale contract above). Fields the file's embedded
    * schema lacks surface as NULL (Avro's own reader-schema evolution
    * stance); a type mismatch fails the task.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(path)
      .select(col("content"))
    val st = schema
    val rdd = bin.queryExecution.toRdd.mapPartitions { rows =>
      rows.flatMap(r => parseShard(r.getBinary(0), st))
    }
    spark.createDataFrame(rdd, st)
  }

  /** Decode one container shard. Pure function of the byte array —
    * unit-testable without Spark.
    */
  private[sources] def parseShard(bytes: Array[Byte], st: StructType): Iterator[Row] = {
    val reader = new DataFileStream[GenericRecord](
      new ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      while (reader.hasNext) {
        val rec = reader.next()
        out += Row.fromSeq(st.fields.map { sf =>
          val v = // Record.get(name) THROWS on unknown fields — probe first
            if (rec.getSchema.getField(sf.name) == null) null else rec.get(sf.name)
          v match {
            case null               => null
            case u: org.apache.avro.util.Utf8 => u.toString
            case bb: ByteBuffer =>
              val arr = new Array[Byte](bb.remaining())
              bb.duplicate().get(arr)
              arr
            case other              => other
          }
        }.toSeq)
      }
    } finally reader.close()
    out.iterator
  }
}
