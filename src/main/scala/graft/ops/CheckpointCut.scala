package graft.ops

import org.apache.spark.sql.DataFrame

/** Round-state materialization for iterative operators (connected
  * components, PageRank / label propagation / BFS, MMR re-rank, BPE
  * training): a RELIABLE checkpoint when the session has a checkpoint
  * directory (survives executor loss — required with dynamic allocation
  * or routine node churn; set `sparkContext.setCheckpointDir` on
  * clusters), else a localCheckpoint (executor-resident blocks; right
  * for local mode, unsafe under decommission — a lost executor fails
  * the query instead of recomputing). Either way the plan truncates to
  * a leaf, which is the point — iterative self-joins otherwise grow the
  * logical plan geometrically in the round count.
  *
  * The reliable path persists BEFORE checkpointing: an unpersisted
  * `checkpoint(eager=true)` runs the plan twice (the eager action, then
  * the checkpoint-write job recomputing every partition), and these are
  * exactly the plans the loops exist to not recompute. The transient
  * cache is dropped once the files are written — the checkpoint FILES
  * are the round state from then on, and [[release]] deletes them when
  * the loop retires the round.
  */
object CheckpointCut {

  /** Eagerly materialize `df` as the current round's state — reliable
    * checkpoint files when a checkpoint dir is configured, else
    * executor-local blocks.
    */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = cached.checkpoint(true)
      cached.unpersist(blocking = false)
      out
    } else df.localCheckpoint(true)

  /** Release a RETIRED round's storage — blocks for a localCheckpoint,
    * FILES for a reliable checkpoint (Spark's ContextCleaner ignores
    * checkpoint files by default, so an iterative loop that doesn't
    * release leaks one rdd-dir per round). ONLY for state with no other
    * readers: a checkpoint has no lineage to recompute from, so
    * releasing under an in-flight consumer is fatal. No-op for plans
    * that aren't a checkpoint leaf.
    */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.graft.shims.releaseCheckpoint(df)
}
