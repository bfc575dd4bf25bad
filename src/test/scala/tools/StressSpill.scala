package tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** Memory-pressure evidence (VERDICT r5 item 4): drive the most expensive
  * queries in the suite against the 10×-replicated sf0.1 inputs under a
  * deliberately constrained heap and prove SPILL-NOT-OOM behaviour of the
  * heap aggregates (TopKByScore), band joins, ADC probe shuffles, and
  * iterative graph rounds.
  *
  * A [[SparkListener]] accumulates per-query task metrics:
  * `memoryBytesSpilled` / `diskBytesSpilled` (execution-memory pressure
  * relieved by spilling instead of OOM), `peakExecutionMemory` (max over
  * tasks), shuffle write volume, and failed-task count (must stay 0 —
  * a task that OOMs and retries would show up here even if the query
  * eventually succeeds).
  *
  * Run (8 GiB heap over ~1.5 GB of 10× parquet in a 32-thread JVM — i.e.
  * 256 MiB/thread, far below the comfortable-sf0.1 ratio):
  * {{{
  * python3 tools/replicate_10x.py /root/testdata/sf0.1 /tmp/sf10x 10
  * SPARK_DRIVER_MEM=8g sbt -batch "Test/runMain tools.StressSpill /tmp/sf10x"
  * }}}
  * Results are recorded in SCALING.md ("Memory pressure").
  */
object StressSpill {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10x")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("v8_ivfpq_disk_index", "v7_ivfpq_recall", "d11_banded_index",
        "g1_pagerank", "g4_label_prop")
    val unknown = names.toSet -- graft.SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")

    val spark = graft.EngineSession.local("*", "stress-spill")
    spark.sparkContext.setLogLevel("WARN")
    println(f"heap: ${Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)}%.1f GiB, " +
      s"threads: ${Runtime.getRuntime.availableProcessors()}, input: $dir")

    // per-query metric accumulation (reset between queries; tasks of a
    // query all end before the blocking collect returns)
    val memSpill = new AtomicLong(0)
    val diskSpill = new AtomicLong(0)
    val peakExec = new AtomicLong(0)
    val shufWrite = new AtomicLong(0)
    val failedTasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (!t.taskInfo.successful) failedTasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          peakExec.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        }
      }
    })

    def consume(df: DataFrame): Long = {
      // full-materialization consume: hash every column of every row so
      // no column pruning or limit can shrink the work under test
      // hash summed as DECIMAL(38,0): a LONG sum of uniform 64-bit values
      // overflows almost surely and ANSI mode (Spark 4 default) throws
      val cols = df.columns.map(c => col(c).cast("string"))
      df.select(coalesce(sum(xxhash64(concat_ws("", cols: _*)).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")),
        count(lit(1))).head().getLong(1)
    }

    var anyFail = false
    names.foreach { name =>
      memSpill.set(0); diskSpill.set(0); peakExec.set(0)
      shufWrite.set(0); failedTasks.set(0)
      val t0 = System.nanoTime()
      val rows =
        try consume(graft.SparkEntry.queries(name)(spark, dir))
        catch {
          case e: Throwable =>
            anyFail = true
            println(s"✗ $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            -1L
        }
      val wall = (System.nanoTime() - t0) / 1e9
      if (rows >= 0) {
        val mib = 1024.0 * 1024
        println(f"✓ $name%-22s $wall%7.1fs  rows=$rows%-9d " +
          f"spillMem=${memSpill.get / mib}%8.1f MiB  " +
          f"spillDisk=${diskSpill.get / mib}%8.1f MiB  " +
          f"peakTaskExecMem=${peakExec.get / mib}%7.1f MiB  " +
          f"shufWrite=${shufWrite.get / mib}%8.1f MiB  " +
          f"failedTasks=${failedTasks.get}")
      }
    }
    if (anyFail) { println("[stress-spill] FAIL"); spark.stop(); sys.exit(1) }
    println("[stress-spill] PASS — no OOM, no failed tasks" +
      (if (failedTasks.get > 0) " (see per-query counts)" else ""))
    spark.stop()
  }
}
