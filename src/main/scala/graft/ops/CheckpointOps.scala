package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block accounting for `localCheckpoint`ed DataFrames.
  *
  * `Dataset.localCheckpoint` persists its internal RDD directly;
  * `Dataset.unpersist` only consults the SQL cache manager, which never
  * tracked that RDD-level persist — so it is a NO-OP for checkpoints, and
  * without an explicit release the blocks live until the ContextCleaner
  * happens to GC the RDD reference. Iterative operators (BFS levels,
  * label-propagation rounds) create one checkpoint per iteration; at 100 TB
  * those superseded blocks are real executor memory, not noise.
  */
object CheckpointOps {

  /** Release the cached blocks behind a `localCheckpoint`ed DataFrame.
    * The DataFrame must not be used again after freeing: its lineage was
    * truncated to exactly these blocks, so recomputation is impossible.
    * No-op for non-checkpointed frames. */
  def free(df: DataFrame): Unit = df.queryExecution.logical match {
    case l: LogicalRDD => l.rdd.unpersist(false): Unit
    case _             => ()
  }
}
