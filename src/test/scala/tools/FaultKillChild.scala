package tools

import org.apache.spark.sql.SparkSession

/** Fault phase 7's crash seam: a [[org.apache.spark.sql.execution.streaming.ManifestFileCommitProtocol]]
  * that HALTS the driver JVM on its Nth `commitJob` — i.e. at the exact
  * instant between the micro-batch's task completions (every output file
  * written, every state-store partition committed) and the file sink's
  * exactly-once manifest entry. `Runtime.halt` skips shutdown hooks and
  * finalizers — the in-process analog of `kill -9` landing mid-commit —
  * and exits 137 (128+SIGKILL) so the parent can tell the deliberate
  * crash from an accidental one. Batch ordinal comes from a JVM-global
  * counter because protocol INSTANCES are per-batch while the crash
  * point is "the Nth sink commit of this driver's life".
  */
class KillingManifestProtocol(jobId: String, path: String)
    extends org.apache.spark.sql.execution.streaming.ManifestFileCommitProtocol(jobId, path) {
  override def commitJob(
      jobContext: org.apache.hadoop.mapreduce.JobContext,
      taskCommits: Seq[org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage]): Unit = {
    val n = KillingManifestProtocol.commits.getAndIncrement()
    if (n == KillingManifestProtocol.haltAt) {
      // stdout so the parent's captured log shows the seam fired
      println(s"[faultchild] HALTING driver at sink commit #$n " +
        "(state committed, manifest NOT written)")
      Console.out.flush()
      Runtime.getRuntime.halt(137)
    }
    super.commitJob(jobContext, taskCommits)
  }
}

object KillingManifestProtocol {
  val commits = new java.util.concurrent.atomic.AtomicInteger()
  lazy val haltAt: Int = Integer.getInteger("graft.fault.haltAtCommit", 2)
}

/** The driver that phase 7 murders: runs the same stateful
  * dedup-with-watermark stream as phases 5/6 (file source, one
  * micro-batch per file, AvailableNow, parquet sink) with the killing
  * protocol installed. If the stream COMPLETES the seam never fired —
  * exit 0 and let the parent fail the phase setup.
  *
  * args: srcGlob checkpointLocation sinkDir
  */
object FaultKillChild {
  def main(args: Array[String]): Unit = {
    val Array(srcGlob, ckptLoc, sinkDir) = args
    val spark = SparkSession.builder().master("local[4]").appName("fault-kill-child")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.commitProtocolClass", "tools.KillingManifestProtocol")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = spark.readStream
      .schema(graft.streaming.EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(srcGlob)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("event_id"))
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("parquet").option("path", sinkDir)
      .option("checkpointLocation", ckptLoc)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    println("[faultchild] stream completed WITHOUT halting — seam never fired")
    spark.stop()
  }
}
