package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (focused local runs)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s): ${unknown.mkString(", ")} — a typo here would " +
          "silently verify nothing")
    }
    // default to every core (the driver may not set SPARK_GRAFT_CPUS);
    // ONE session bootstrap (EngineSession) — a local builder here would
    // silently drop the SQL-function registration and checkpoint-cleaner
    // conf the factory centralizes
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")
    val spark = EngineSession.local(cpus, "graft-verify",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"),
      inputDir = Some(sfDir))
    new java.io.File(outDir).mkdirs()
    // Submit queries concurrently (Spark's scheduler interleaves jobs) —
    // most of these are small; serial execution leaves the cluster idle
    // between stages and multiplies wall time ~4x. BUT driver heap
    // scales with IN-FLIGHT queries, not data (the measured rule: 8 GiB
    // carries 4 concurrent queries at sf0.1 ≈ 17 MB of parquet; the 10×
    // replica needed 64 GiB at the same concurrency — ~2 GiB per
    // in-flight query per sf0.1-equivalent of input). So the pool is
    // heap-aware by default: concurrency degrades toward serial before
    // the driver OOMs, instead of requiring a manual 64 GiB rerun.
    // GRAFT_VERIFY_PARALLEL overrides (the operator knows best).
    val dirMb = {
      val mb = EngineSession.dirBytes(sfDir) / 1e6
      if (mb > 0) mb else 17.0 // nonexistent/empty dir: assume sf0.1-ish
    }
    // round, don't floor: -Xmx8g reports maxMemory a shade under 8 GiB,
    // and floor-dividing by 2^30 would cost a concurrency slot
    val heapGb = math.round(Runtime.getRuntime.maxMemory.toDouble / (1L << 30))
    val perQueryGb = math.max(2.0, dirMb / 11.0)
    val autoPar = math.max(1, math.min(4, (heapGb / perQueryGb).toInt))
    val par = sys.env.get("GRAFT_VERIFY_PARALLEL").map(_.toInt).getOrElse(autoPar)
    System.err.println(s"[verify] input ${dirMb.round} MB, driver heap ${heapGb} GiB " +
      s"-> $par concurrent quer${if (par == 1) "y" else "ies"}" +
      (if (sys.env.contains("GRAFT_VERIFY_PARALLEL")) " (env override)" else ""))
    // Requested-query manifest, written BEFORE any query runs (ADVICE r9):
    // the oracle harness checks coverage against this list, and the
    // partial-failure class it exists to catch — the JVM dying mid-run —
    // would otherwise also kill the manifest write and silently disable
    // the check. The requested list is known up front; stamp it now.
    val requested = SparkEntry.queries.keys.toSeq
      .filter(n => only.forall(_.contains(n))).sorted
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      requested.map(JsonUtil.quote).mkString("[", ",", "]"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      scala.concurrent.Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonUtil.quote(k)}: ${JsonUtil.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
