package tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerJobEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** Executor-LOSS fault injection (VERDICT r6 item 4; phases 4-5 added
  * for VERDICT r7 item 5): the reliable-checkpoint tier's claim —
  * "round state survives executor loss when a checkpoint dir is set" —
  * tested as a contract instead of asserted from lineage. Six phases:
  *
  *   1. baseline — plain `local[4]`, no faults: the reference ranks of
  *      a 16-round PageRank over the g1 graph;
  *   2. WITH a checkpoint dir on `local-cluster[2,2,1536]` (two REAL
  *      executor JVMs): a task pinned to one executor calls
  *      `System.exit` mid-iteration (~round 5 of 16) — the JVM dies,
  *      its cached blocks die with it (removal is listener-confirmed),
  *      the standalone master replaces it — and the query must
  *      COMPLETE with ranks exactly equal to the baseline (recompute
  *      reads round-state checkpoint FILES, which the dead executor
  *      cannot take down);
  *   3. WITHOUT a dir: `CheckpointCut.cut` state is localCheckpoint
  *      blocks resident on the executors — kill the executor HOLDING
  *      them (surgical: victim = the block holder at fire time; a
  *      full-query race lets round releases dodge the kill) and the
  *      next consumer must FAIL with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
  *      — the documented unsafe-under-decommission behavior
  *      ("a lost executor fails the query instead of recomputing",
  *      CheckpointCut's Scaladoc);
  *   4. connected components (a SECOND iterative family — unlike
  *      PageRank's fixed 16 rounds, `Dedup.connectedComponents`
  *      converges data-dependently, interleaves checkpoint state with
  *      MEMORY_AND_DISK persists it materializes mid-round, and sits
  *      behind the label memo): executor killed mid-convergence with a
  *      reliable checkpoint dir — labels must exactly equal the
  *      no-fault baseline;
  *   5. streaming state-store recovery: a stateful streaming query
  *      (`dropDuplicatesWithinWatermark`, file source, one micro-batch
  *      per file) loses an executor AFTER two committed micro-batches;
  *      the retried tasks must reload dedup state for their partitions
  *      from the checkpointLocation (HDFS-backed state store), so
  *      duplicates of PRE-KILL ids arriving in POST-KILL batches are
  *      still suppressed and the output equals the batch twin exactly.
  *      State lost rather than recovered would EMIT those duplicates —
  *      a wrong answer, not a crash — which is why the check is
  *      row-set equality, not query survival;
  *   6. DRIVER restart under append (r9): the same stateful stream run
  *      to completion, the SESSION stopped (only checkpointLocation +
  *      file sink survive), new files appended — every committed id
  *      re-sent at a later event time inside the horizon, plus a fresh
  *      range — and a new session restarted on the same checkpoint.
  *      The sink must equal the batch twin exactly: no reprocessed
  *      source files, no emitted re-sends, fresh ids flowing.
  *
  * Exit code 99 marks the deliberate kill in worker logs.
  *
  * Run (SPARK_HOME so the in-process standalone Worker can launch
  * executor JVMs; SPARK_SCALA_VERSION because the launcher's
  * getScalaVersion probe otherwise dies with "Cannot find any build
  * directories" when relaunching the replacement executor):
  * {{{
  * SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   sbt -batch "Test/runMain tools.FaultInject /root/testdata/sf0.01"
  * }}}
  * Prints one PASS/FAIL line per phase; exits non-zero on any FAIL.
  * Results recorded in SCALING.md ("Executor loss").
  */
object FaultInject {

  // the JDK17 module opens Spark needs when launched outside spark-submit
  // (the executor JVMs here are launched by the in-process Worker, which
  // forwards only spark.executor.extraJavaOptions)
  val openStr: String = addOpens
  private lazy val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  private def clusterSession(app: String): SparkSession = {
    val cp = Seq("/root/repo/target/scala-2.13/classes",
      "/root/repo/target/scala-2.13/test-classes").mkString(":")
    SparkSession.builder()
      .master("local-cluster[2,2,1536]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", addOpens)
      // four task-retry slots: the kill job's own victim tasks plus the
      // in-flight round tasks all retry on the replacement executor
      .config("spark.task.maxFailures", "4")
      .getOrCreate()
  }

  /** The g1 graph: customer↔supplier co-order edges, both orientations. */
  private def g1Edges(spark: SparkSession, dir: String): DataFrame = {
    val t = (n: String) => spark.read.parquet(s"$dir/$n.parquet")
    val pairs = t("orders")
      .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    pairs.select(explode(array(
        struct(col("a").as("s"), col("b").as("d")),
        struct(col("b").as("s"), col("a").as("d")))).as("e"))
      .select(col("e.s").as("a"), col("e.d").as("b"))
  }

  private val rounds = 16

  private def ranksOf(spark: SparkSession, dir: String): Map[Long, Long] =
    graft.ops.Graph.pageRank(g1Edges(spark, dir), "a", "b", iterations = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** The CC phase's pair relation: the same co-order edges as
    * canonical (id_a < id_b) pairs. Bipartite ids (even customers, odd
    * suppliers) so least/greatest only canonicalizes — no self loops.
    */
  private def ccPairs(spark: SparkSession, dir: String): DataFrame =
    g1Edges(spark, dir)
      .select(least(col("a"), col("b")).as("id_a"),
        greatest(col("a"), col("b")).as("id_b"))
      .distinct()

  private def ccLabels(spark: SparkSession, dir: String): Map[Long, Long] =
    graft.ops.Dedup.connectedComponents(ccPairs(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Stage the streaming-phase fixture: 8 parquet files, one
    * micro-batch each (`maxFilesPerTrigger=1`). Files 0-3 carry fresh
    * ids (250 each); files 4-7 carry ONLY duplicates of ids first seen
    * in files 0-3 — i.e. every row after the kill point (batch ≥ 2)
    * re-sends state the query committed before the kill, at a LATER
    * event time. Everything sits inside the 1 h watermark horizon, so
    * `dropDuplicatesWithinWatermark` must suppress all 1000 re-sends —
    * iff the retried tasks actually reload pre-kill state from the
    * checkpoint. Returns (dir, expected sorted event_id seq).
    */
  private def stageStreamFixture(spark: SparkSession): (String, Seq[Long]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fault_stream").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def rows(ids: Range, offsetSec: Int) = ids.map(i =>
      (i.toLong, new java.sql.Timestamp(t0 + offsetSec * 1000L + i),
        i.toLong % 7, "x", 1.0, "{}"))
    val files =
      (0 to 3).map(f => rows(f * 250 until (f + 1) * 250, f * 60)) ++
      (0 to 3).map(f => rows(f * 250 until (f + 1) * 250, 1200 + f * 60))
    files.zipWithIndex.foreach { case (rs, i) =>
      rs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/f$i")
    }
    (s"$dir/f*", (0L until 1000L).toSeq)
  }

  /** The executor holding the MOST persisted round-state blocks right
    * now — the surgical victim for the localCheckpoint phase: killing a
    * block-free executor proves nothing (the query heals trivially),
    * killing the holder must lose the round state.
    */
  private def blockHolder(sc: org.apache.spark.SparkContext): Option[String] = {
    val bm = org.apache.spark.SparkEnv.get.blockManager.master
    val holders = sc.getPersistentRDDs.toSeq.flatMap { case (id, rdd) =>
      (0 until rdd.getNumPartitions).flatMap(i =>
        bm.getLocations(org.apache.spark.storage.RDDBlockId(id, i)).map(_.executorId))
    }.filter(_ != "driver")
    if (holders.isEmpty) None
    else Some(holders.groupBy(identity).maxBy(_._2.size)._1)
  }

  /** Arm the mid-iteration executor kill; returns the armed flag.
    * `victimByBlocks` picks the executor holding the round state at
    * fire time (the localCheckpoint phase — the kill must actually lose
    * state); otherwise the victim is picked UP FRONT by a probe job
    * (submitting the probe lazily loses the race against fast rounds).
    */
  private def armKill(
      spark: SparkSession,
      killAfterJobs: Int,
      victimByBlocks: Boolean = false): AtomicBoolean = {
    val sc = spark.sparkContext
    val probed =
      if (victimByBlocks) "?"
      else sc.parallelize(1 to 4, 4)
        .map(_ => org.apache.spark.SparkEnv.get.executorId)
        .collect().min
    val jobsDone = new AtomicInteger(0)
    val fired = new AtomicBoolean(false)
    sc.addSparkListener(new SparkListener {
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobsDone.incrementAndGet()
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        System.err.println(s"[fault-inject] executor ${e.executorId} REMOVED " +
          s"(${e.reason}) after ${jobsDone.get()} jobs")
    })
    val t = new Thread(() => {
      while (jobsDone.get() < killAfterJobs) Thread.sleep(10)
      if (fired.compareAndSet(false, true)) {
        val victim =
          if (victimByBlocks)
            blockHolder(sc).getOrElse( // no blocks yet: any executor
              sc.parallelize(1 to 4, 4)
                .map(_ => org.apache.spark.SparkEnv.get.executorId).collect().min)
          else probed
        System.err.println(s"[fault-inject] killing executor $victim " +
          s"after ${jobsDone.get()} jobs")
        try {
          sc.parallelize(1 to 8, 8).foreach { _ =>
            if (org.apache.spark.SparkEnv.get.executorId == victim) System.exit(99)
          }
        } catch { case _: Throwable => () } // kill job may die with the victim
      }
    })
    t.setDaemon(true)
    t.start()
    fired
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    require(sys.env.contains("SPARK_HOME"),
      "SPARK_HOME must point at a Spark dist (executor JVM launch)")
    var failures = 0

    // 1. baseline, no faults (PageRank for phase 2, CC labels for phase 4)
    val local = graft.EngineSession.local("4", "fault-baseline")
    val expected = ranksOf(local, dir)
    val expectedLabels = ccLabels(local, dir)
    println(s"baseline: ${expected.size} ranked nodes, " +
      s"${expectedLabels.size} labeled nodes " +
      s"(CC converged in ${graft.ops.Dedup.lastConvergenceRounds} rounds)")
    local.stop()

    // 2. reliable checkpoint dir + executor kill → must complete & match
    {
      val spark = clusterSession("fault-reliable")
      spark.sparkContext.setLogLevel("WARN")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_fault_ckpt").toString
      spark.sparkContext.setCheckpointDir(ckpt)
      // the victim probe is job 1; kill lands ~5 rounds into the 16
      val fired = armKill(spark, killAfterJobs = 6)
      try {
        val got = ranksOf(spark, dir)
        val ok = fired.get() && got == expected
        println(s"reliable-checkpoint under executor loss: " +
          s"${if (ok) "PASS" else "FAIL"} (kill fired=${fired.get()}, " +
          s"nodes=${got.size}, match=${got == expected})")
        if (!ok) failures += 1
      } catch {
        case e: Throwable =>
          println(s"reliable-checkpoint under executor loss: FAIL (query died: " +
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)})")
          failures += 1
      } finally spark.stop()
    }

    // 3. no checkpoint dir: CheckpointCut.cut falls back to
    // localCheckpoint blocks, and losing the executor that HOLDS them
    // must fail the consumer — the documented unsafe-under-decommission
    // contract, tested surgically (a full query run races the kill
    // against round releases; here the state is pinned, its holder
    // killed, and the next consumer must die)
    {
      val spark = clusterSession("fault-local-ckpt")
      spark.sparkContext.setLogLevel("ERROR") // the expected failure is noisy
      val sc = spark.sparkContext
      val removed = new AtomicBoolean(false)
      sc.addSparkListener(new SparkListener {
        override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
          System.err.println(s"[fault-inject] executor ${e.executorId} REMOVED (${e.reason})")
          removed.set(true)
        }
      })
      while (sc.getExecutorMemoryStatus.size < 3) Thread.sleep(200) // driver + 2
      try {
        require(sc.getCheckpointDir.isEmpty)
        val state = graft.ops.CheckpointCut.cut(
          g1Edges(spark, dir).groupBy("a").count())
        val before = state.count()
        val victim = blockHolder(sc).get
        System.err.println(s"[fault-inject] killing block holder $victim")
        try {
          sc.parallelize(1 to 8, 8).foreach { _ =>
            if (org.apache.spark.SparkEnv.get.executorId == victim) System.exit(99)
          }
        } catch { case _: Throwable => () }
        while (!removed.get()) Thread.sleep(100)
        Thread.sleep(1000)
        try {
          val after = state.count()
          println(s"localCheckpoint under executor loss: FAIL (consumer survived " +
            s"losing the block holder: $before -> $after rows — the documented " +
            "failure mode did not occur)")
          failures += 1
        } catch {
          case e: Throwable =>
            println("localCheckpoint under executor loss: PASS " +
              s"(failed as documented: ${e.getClass.getSimpleName}: " +
              s"${String.valueOf(e.getMessage).take(120)})")
        }
      } finally spark.stop()
    }

    // 4. connected components mid-convergence + executor kill → labels
    // must match the baseline exactly (checkpointed round state +
    // mid-round MEMORY_AND_DISK persists both recover through the
    // reliable checkpoint FILES; the label memo cannot leak across
    // sessions — it is session-keyed)
    {
      val spark = clusterSession("fault-cc")
      spark.sparkContext.setLogLevel("WARN")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_fault_cc").toString
      spark.sparkContext.setCheckpointDir(ckpt)
      // probe is job 1; edges/seed checkpoints land next, so the kill
      // fires inside the convergence loop
      val fired = armKill(spark, killAfterJobs = 4)
      try {
        val got = ccLabels(spark, dir)
        val ok = fired.get() && got == expectedLabels
        println(s"connected components under executor loss: " +
          s"${if (ok) "PASS" else "FAIL"} (kill fired=${fired.get()}, " +
          s"nodes=${got.size}, match=${got == expectedLabels}, " +
          s"rounds=${graft.ops.Dedup.lastConvergenceRounds})")
        if (!ok) failures += 1
      } catch {
        case e: Throwable =>
          println(s"connected components under executor loss: FAIL (query died: " +
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)})")
          failures += 1
      } finally spark.stop()
    }

    // 5. streaming state-store recovery: lose an executor after two
    // committed micro-batches; later batches re-send every pre-kill id
    // (later event time, inside the watermark), so the output is the
    // 1000 first arrivals IFF the retried tasks reload dedup state
    // from the checkpointLocation — lost state EMITS the re-sends (a
    // wrong answer, not a crash), which the multiset equality catches
    {
      val spark = clusterSession("fault-stream")
      spark.sparkContext.setLogLevel("WARN")
      val sc = spark.sparkContext
      while (sc.getExecutorMemoryStatus.size < 3) Thread.sleep(200) // driver + 2
      try {
        val (glob, expectedIds) = stageStreamFixture(spark)
        val ckptLoc = java.nio.file.Files
          .createTempDirectory("graft_fault_stream_ckpt").toString
        val victim = sc.parallelize(1 to 4, 4)
          .map(_ => org.apache.spark.SparkEnv.get.executorId).collect().min
        val batches = new AtomicInteger(0)
        val fired = new AtomicBoolean(false)
        spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit = {
            if (e.progress.numInputRows > 0) batches.incrementAndGet()
            ()
          }
        })
        val killer = new Thread(() => {
          while (batches.get() < 2) Thread.sleep(10)
          if (fired.compareAndSet(false, true)) {
            System.err.println(s"[fault-inject] killing executor $victim " +
              s"after ${batches.get()} committed micro-batches")
            try {
              sc.parallelize(1 to 8, 8).foreach { _ =>
                if (org.apache.spark.SparkEnv.get.executorId == victim) System.exit(99)
              }
            } catch { case _: Throwable => () }
          }
        })
        killer.setDaemon(true)
        killer.start()
        val q = spark.readStream
          .schema(graft.streaming.EventStreams.eventSchema)
          .option("maxFilesPerTrigger", "1").parquet(glob)
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark(Seq("event_id"))
          .writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .format("memory").queryName("fault_sdedup")
          .option("checkpointLocation", ckptLoc)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val got = spark.table("fault_sdedup")
          .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
        val ok = fired.get() && got == expectedIds
        println(s"streaming state-store recovery under executor loss: " +
          s"${if (ok) "PASS" else "FAIL"} (kill fired=${fired.get()}, " +
          s"batches=${batches.get()}, rows=${got.size}, " +
          s"match=${got == expectedIds})")
        if (!ok) failures += 1
      } catch {
        case e: Throwable =>
          println(s"streaming state-store recovery under executor loss: FAIL " +
            s"(query died: ${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).take(160)})")
          failures += 1
      } finally spark.stop()
    }

    // 6. DRIVER restart under append — the operational recovery story a
    // user actually exercises: run a stateful stream to completion,
    // STOP THE SESSION (the driver's state is gone; only the
    // checkpointLocation and the file sink survive), append new files
    // whose rows re-send every pre-restart id at a later event time
    // (inside the watermark horizon) plus a fresh id range, then start
    // a NEW session on the same checkpoint. The restarted query must
    // (a) not reprocess the already-committed files (file-source log),
    // (b) reload the dedup state store and suppress all 1000 re-sends,
    // (c) pass the fresh ids through — so the sink equals the batch
    // twin (first arrival per event_id) as a row multiset. Lost state
    // would EMIT the re-sends; a replayed source would duplicate the
    // first wave: both are wrong ANSWERS this equality catches.
    {
      val fixDir = java.nio.file.Files.createTempDirectory("graft_fault_restart").toString
      val ckptLoc = s"$fixDir/ckpt"
      val sinkDir = s"$fixDir/sink"
      val srcDir = s"$fixDir/src"
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
      def localSession(app: String): SparkSession = {
        val s = SparkSession.builder().master("local[4]").appName(app)
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        s.sparkContext.setLogLevel("WARN")
        s
      }
      def writeWave(s: SparkSession, ids: Range, offsetSec: Int, file: String): Unit = {
        import s.implicits._
        ids.map(i => (i.toLong, new java.sql.Timestamp(t0 + offsetSec * 1000L + i),
            i.toLong % 7, "x", 1.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.parquet(s"$srcDir/$file")
      }
      def runStream(s: SparkSession): Unit = {
        val q = s.readStream
          .schema(graft.streaming.EventStreams.eventSchema)
          .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/f*")
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark(Seq("event_id"))
          .writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .format("parquet").option("path", sinkDir)
          .option("checkpointLocation", ckptLoc)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      try {
        // run 1: four files of fresh ids 0..999
        val s1 = localSession("fault-restart-1")
        (0 to 3).foreach(f => writeWave(s1, f * 250 until (f + 1) * 250, f * 60, s"f$f"))
        runStream(s1)
        val afterRun1 = s1.read.parquet(sinkDir).count()
        s1.stop() // DRIVER GONE — only ckpt + sink + source files remain
        // append under the stopped driver: every pre-restart id re-sent
        // ~20 min later (inside the 1 h horizon) + fresh ids 1000..1249
        val s2 = localSession("fault-restart-2")
        (0 to 3).foreach(f =>
          writeWave(s2, f * 250 until (f + 1) * 250, 1200 + f * 60, s"f${4 + f}"))
        writeWave(s2, 1000 until 1250, 1500, "f8")
        runStream(s2) // restart from the same checkpointLocation
        val got = s2.read.parquet(sinkDir)
          .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
        val expected = (0L until 1250L).toSeq // batch twin: first arrival per id
        val ok = afterRun1 == 1000L && got == expected
        println(s"driver restart under append (streaming): " +
          s"${if (ok) "PASS" else "FAIL"} (run1 rows=$afterRun1, " +
          s"run2 rows=${got.size}, match=${got == expected})")
        if (!ok) failures += 1
        s2.stop()
      } catch {
        case e: Throwable =>
          println(s"driver restart under append (streaming): FAIL " +
            s"(query died: ${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).take(160)})")
          failures += 1
      }
    }

    // 7. HARD KILL MID-COMMIT (r10) — phase 6 stops the session
    // gracefully after completion; this phase murders the driver DURING
    // an AvailableNow batch, at the seam between the state-store commits
    // (task-side, already durable) and the file sink's manifest entry
    // (driver-side, about to be written). The kill is a separate child
    // JVM running tools.FaultKillChild with a commit protocol that
    // Runtime.halt(137)s on its 3rd sink commit — no shutdown hooks, no
    // cleanup, the kill -9 shape. A restarted session on the same
    // checkpoint must re-execute the murdered batch: its first attempt's
    // output files are ORPHANS (on disk, in no manifest) that a
    // manifest-routed read must discard, while the re-execution's files
    // commit exactly once. PASS = the dead batch's orphans exist AND the
    // sink read equals the batch twin (first arrival per event_id) as a
    // row multiset — double-counting the orphans, losing the batch, or
    // emitting the re-sent duplicates all break the equality.
    {
      val fixDir = java.nio.file.Files.createTempDirectory("graft_fault_kill9").toString
      val ckptLoc = s"$fixDir/ckpt"
      val sinkDir = s"$fixDir/sink"
      val srcDir = s"$fixDir/src"
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
      def localSession(app: String): SparkSession = {
        val s = SparkSession.builder().master("local[4]").appName(app)
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        s.sparkContext.setLogLevel("WARN")
        s
      }
      def writeWave(s: SparkSession, ids: Range, offsetSec: Int, file: String): Unit = {
        import s.implicits._
        ids.map(i => (i.toLong, new java.sql.Timestamp(t0 + offsetSec * 1000L + i),
            i.toLong % 7, "x", 1.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.parquet(s"$srcDir/$file")
      }
      try {
        // six one-file batches: f0..f3 fresh 0..999; f4 re-sends 0..249
        // twenty minutes later (inside the 1 h horizon — reloaded state
        // must suppress them); f5 fresh 1000..1249
        val s0 = localSession("fault-kill9-fixtures")
        (0 to 3).foreach(f => writeWave(s0, f * 250 until (f + 1) * 250, f * 60, s"f$f"))
        writeWave(s0, 0 until 250, 1200, "f4")
        writeWave(s0, 1000 until 1250, 1500, "f5")
        s0.stop()
        // child driver, murdered at its 3rd sink commit (batch 2 of 6)
        val cp = Seq("/root/repo/target/scala-2.13/classes",
          "/root/repo/target/scala-2.13/test-classes", "/opt/spark/jars/*").mkString(":")
        val javaBin = s"${System.getProperty("java.home")}/bin/java"
        val cmd = Seq(javaBin) ++ openStr.split(" ").toSeq ++ Seq(
          "-Xmx3g", "-Dgraft.fault.haltAtCommit=2", "-cp", cp,
          "tools.FaultKillChild", s"$srcDir/f*", ckptLoc, sinkDir)
        val childLog = new java.io.File(s"$fixDir/child.log")
        val proc = new ProcessBuilder(cmd: _*)
          .redirectErrorStream(true).redirectOutput(childLog).start()
        val exit = proc.waitFor()
        val seamFired = exit == 137
        // the murdered batch's files are on disk; its manifest entry is not
        val meta = new java.io.File(s"$sinkDir/_spark_metadata")
        val manifestsBeforeRestart =
          Option(meta.list()).map(_.count(_.matches("\\d+"))).getOrElse(0)
        def committedPaths(): Set[String] =
          Option(meta.listFiles()).getOrElse(Array.empty)
            .filter(_.getName.matches("\\d+"))
            .flatMap(f => scala.io.Source.fromFile(f).getLines()
              .flatMap("\"path\":\"([^\"]+)\"".r.findAllMatchIn(_).map(_.group(1))))
            .map(p => new java.net.URI(p).getPath).toSet
        def diskParts(): Set[String] =
          Option(new java.io.File(sinkDir).listFiles()).getOrElse(Array.empty)
            .filter(f => f.isFile && f.getName.startsWith("part-"))
            .map(_.getAbsolutePath).toSet
        val orphansAtDeath = (diskParts() -- committedPaths()).size
        // restart on the same checkpoint with the DEFAULT protocol: the
        // murdered batch re-executes, then the remaining batches drain
        val s2 = localSession("fault-kill9-restart")
        val q = s2.readStream
          .schema(graft.streaming.EventStreams.eventSchema)
          .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/f*")
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark(Seq("event_id"))
          .writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .format("parquet").option("path", sinkDir)
          .option("checkpointLocation", ckptLoc)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val orphansAfterRestart = (diskParts() -- committedPaths()).size
        // manifest-routed read (spark.read over a _spark_metadata sink)
        val got = s2.read.parquet(sinkDir)
          .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
        val expected = (0L until 1250L).toSeq
        val ok = seamFired && manifestsBeforeRestart == 2 &&
          orphansAtDeath > 0 && orphansAfterRestart >= orphansAtDeath &&
          got == expected
        println(s"hard kill mid-commit (driver halt between state and sink commit): " +
          s"${if (ok) "PASS" else "FAIL"} (child exit=$exit, " +
          s"manifests at death=$manifestsBeforeRestart, orphans=$orphansAtDeath, " +
          s"rows=${got.size}, match=${got == expected})")
        if (!ok) {
          scala.io.Source.fromFile(childLog).getLines().toSeq.takeRight(15)
            .foreach(l => println(s"  [child] $l"))
          failures += 1
        }
        s2.stop()
      } catch {
        case e: Throwable =>
          println(s"hard kill mid-commit (driver halt between state and sink commit): FAIL " +
            s"(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)})")
          failures += 1
      }
    }

    if (failures > 0) { println(s"$failures FAILURE(S)"); sys.exit(1) }
    println("fault injection: all phases as expected")
  }
}
