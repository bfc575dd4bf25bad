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
  /** Standard local session. `cores` defaults to all available. */
  def local(cores: String = "*", appName: String = "graft"): SparkSession = {
    val shufflePartitions =
      if (cores == "*") Runtime.getRuntime.availableProcessors().toString else cores
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // reliable-checkpoint files (iterative operators with a checkpoint
      // dir set) must be GC-collectable — the Spark default leaves them
      // on disk for the application's lifetime
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark) // SQL surface: obfuscate_name, vec_*, ...
    spark
  }
}
