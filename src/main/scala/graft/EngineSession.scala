package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults chosen for the 100 TB design point, scaled down to local mode:
  *   - AQE on (runtime coalescing, skew-join splitting, SMJ→BHJ conversion);
  *   - shuffle partitions sized to the executor-thread count locally (on a
  *     real cluster this would be 2-3× total cores, or left to AQE's
  *     `spark.sql.adaptive.coalescePartitions`);
  *   - UTC session time zone so date/timestamp semantics match the DuckDB
  *     oracle bit-for-bit.
  */
object EngineSession {
  /** Recursive on-disk size of a file or directory (directory-shaped
    * parquet datasets — part files under a table dir — must count).
    * Shared by the shuffle-partition autosizer here and Verify's
    * heap-aware concurrency gate.
    *
    * Scheme-aware: resolved through Hadoop's `FileSystem` so the SAME
    * derivation holds for `hdfs://`, `s3a://`, `file://`, and bare local
    * paths — at the 100 TB design point the input is object storage, and
    * a `java.io.File` walk there would size it as 0 bytes and silently
    * reinstate the thread-count default whose 458 GB g1 spill the
    * autosizer exists to prevent (SCALING.md, r8 measurement). A path the
    * filesystem layer cannot resolve (unknown scheme, no such file) sizes
    * as 0 with a WARN — the conservative fallback, never a crash, because
    * every caller treats 0 as "keep the thread-count default". */
  def dirBytes(path: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      // Fresh conf (scheme → FileSystem impl ships in hadoop-client);
      // session confs would matter for auth on a real cluster — callers
      // there should size AFTER session build and pass
      // spark.sessionState.newHadoopConf(). Local/file/hdfs need none.
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    } catch {
      case e: Exception =>
        System.err.println(s"[engine] WARN: could not size input '$path' " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}) — autosizer " +
          "falls back to the thread-count default")
        0L
    }

  /** Target post-shuffle partition input at the design point: the r8
    * 1000x measurement (tools.ProfileSpill, SCALING.md) put the knee at
    * 128 partitions for a ~17 GB input — ~128 MiB of source bytes per
    * partition. Below threads×target the thread-count default wins, so
    * every verified test-SF plan (sf0.001–100x on this box) is
    * bit-identical with or without an inputDir. */
  private val TargetPartitionBytes: Long = 128L << 20

  /** Pure partition derivation (unit-tested): thread count until the
    * input outgrows threads×128 MiB, then one partition per 128 MiB of
    * source bytes. sf0.001–/tmp/sf100x (≤1.7 GB) all stay at the
    * 32-thread default on this box; /tmp/sf1000x (~17 GB) derives 129. */
  def derivePartitions(threads: Int, inputBytes: Long): Int =
    math.max(threads,
      ((inputBytes + TargetPartitionBytes - 1) / TargetPartitionBytes).toInt)

  /** Standard local session. `cores` defaults to all available.
    * `extraConfs` layers caller-specific settings (e.g. the ns-parquet
    * legacy flag) on the shared base — Verify/Bench build through here
    * so there is ONE session bootstrap, not three drifting copies.
    * `inputDir` (the sf dir a main is about to read) lets the session
    * autosize shuffle partitions from input bytes — the r8 lesson that
    * a fixed thread-count default spills 458 GB on a 17 GB input turned
    * into code instead of an env var an operator must know about.
    */
  def local(
      cores: String = "*",
      appName: String = "graft",
      extraConfs: Map[String, String] = Map.empty,
      inputDir: Option[String] = None): SparkSession = {
    // `cores` is a master THREAD spec — "4,3" (local[N,maxFailures]) is
    // legal — so only its leading integer may size shuffle partitions.
    val threads = "^[0-9]+".r.findFirstIn(cores)
      .getOrElse(Runtime.getRuntime.availableProcessors().toString).toInt
    // Partition sizing, in precedence order:
    //   1. SPARK_GRAFT_SHUFFLE_PARTITIONS — the operator knows best.
    //      Validated (digits only, fail fast) and WARNed when active: a
    //      leaked env var from an above-sf0.1 run would otherwise
    //      silently change the plans of a hash-verified small-SF pass.
    //   2. max(threads, ceil(inputBytes / 128 MiB)) when inputDir is
    //      given — at /tmp/sf1000x (~17 GB: 600M-row lineitem, 100M
    //      events) the thread-count default puts ~3M rows in each
    //      iterative-graph partition and g1_pagerank spills 458 GB;
    //      128 (the measured knee — 512 over-fragments: GC doubles and
    //      wall returns to baseline) halves the spill and cuts wall 20%.
    //      On a real cluster this is the standard 2-4× total-cores
    //      setting, derived from data volume instead of hardcoded.
    //   3. thread count — keeps every verified test-SF plan unchanged.
    val shufflePartitions = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS") match {
      case Some(v) =>
        // toInt, not a digits regex: "0" and Int-overflowing strings are
        // digits-only but would fail later inside Spark with an unrelated
        // error instead of failing fast here (ADVICE r9).
        require(scala.util.Try(v.toInt).toOption.exists(_ > 0),
          s"SPARK_GRAFT_SHUFFLE_PARTITIONS must be a positive integer, got '$v'")
        System.err.println(s"[engine] WARN: SPARK_GRAFT_SHUFFLE_PARTITIONS=$v " +
          "override active — plans differ from the default-config verified surface")
        v
      case None =>
        val n = derivePartitions(threads, inputDir.map(dirBytes).getOrElse(0L))
        if (n != threads)
          System.err.println(s"[engine] shuffle partitions autosized to $n " +
            s"(input ${inputDir.get} exceeds threads=$threads x 128 MiB)")
        n.toString
    }
    val base = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Let AQE apply (incl. partition coalescing) when materializing
      // CACHED plans. Off (the default), every `persist()`ed operator
      // artifact — the CacheSlot adjacencies, postings, signature tables
      // every iterative loop joins per round — materializes at the full
      // spark.sql.shuffle.partitions, and that layout propagates to every
      // downstream loop stage (the cached side satisfies the join's
      // distribution, so nothing downstream ever re-sizes it). Measured at
      // sf0.1/local[32]: nodes-sized round state ran 32 tasks/stage with
      // ~0.3-0.7 executor-CPU-s of pure per-task overhead each — g8_hits
      // burned 52 CPU-s at 32 cores vs 8.8 at 8 cores for identical work
      // (the r10 verdict's anti-scaling cohort). With AQE sizing the
      // cached build, the same state materializes at bytes-derived
      // partition counts (1-5 at sf0.1): g8 52->5.3 CPU-s, g1 77->9.8,
      // full 288-query bench 1451->804 CPU-s on one boot, zero
      // regressions. Scale-adaptive by construction: big cached relations
      // keep ~parallelism-many partitions (AQE's parallelismFirst rule),
      // so this is not a local-mode constant — it replaces the
      // thread-count floor with AQE's bytes rule for cached state.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // spark.shuffle.sort.bypassMergeThreshold stays at its default
      // (200): thread-stack sampling showed the bypass writer's
      // file-per-reduce-partition opens as the dominant busy-thread
      // activity on tiny shuffles, and lowering the threshold to 8 did
      // cut the full-bench executor CPU 791 -> 654 s — but it REGRESSED
      // wall 255 -> 347 s (geomean 1.38x; streaming micro-batch queries
      // up to 4x) because the sort-path writer's per-task serialization
      // latency outweighs the saved opens when every task is tiny.
      // Measured and rejected; at cluster scale reduce counts exceed the
      // threshold and the bypass writer never fires anyway.
      // reliable-checkpoint files (iterative operators with a checkpoint
      // dir set) must be GC-collectable — the Spark default leaves them
      // on disk for the application's lifetime
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = extraConfs.foldLeft(base)((b, kv) => b.config(kv._1, kv._2)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark) // SQL surface: obfuscate_name, vec_*, ...
    spark
  }
}
