package tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerJobEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** Executor-LOSS fault injection (VERDICT r6 item 4): the reliable-
  * checkpoint tier's claim — "round state survives executor loss when a
  * checkpoint dir is set" — tested as a contract instead of asserted
  * from lineage. Three phases:
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
  *      CheckpointCut's Scaladoc).
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

    // 1. baseline, no faults
    val local = graft.EngineSession.local("4", "fault-baseline")
    val expected = ranksOf(local, dir)
    println(s"baseline: ${expected.size} ranked nodes")
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

    if (failures > 0) { println(s"$failures FAILURE(S)"); sys.exit(1) }
    println("fault injection: all phases as expected")
  }
}
