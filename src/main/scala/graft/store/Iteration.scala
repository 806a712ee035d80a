package graft.store

import org.apache.spark.sql.DataFrame

/** Durable materialization seam for iterative algorithms (connected
  * components, k-means training): each round's output must be pinned
  * so lineage does not grow exponentially across iterations, but the
  * two pinning mechanisms trade durability for cost.
  *
  *  - `localCheckpoint(eager = true)` stores blocks on EXECUTORS and
  *    truncates lineage: cheap, but on a real cluster an executor loss
  *    mid-iteration loses blocks that can no longer be recomputed —
  *    the job dies unrecoverably. Fine on local[n] (one JVM, no
  *    executor churn) and for tests.
  *  - reliable `checkpoint()` writes blocks to the configured
  *    checkpoint directory (HDFS/object store on a cluster): an
  *    executor loss just re-reads the files. The cost is one
  *    write+read of the frame per round — the standard price of a
  *    fault-tolerant iterative job at 100 TB.
  *
  * This seam picks reliable checkpointing whenever the session has a
  * checkpoint dir configured (`spark.sparkContext.setCheckpointDir`),
  * so cluster deployments opt in with one line of session setup and
  * local runs keep the cheap path. See SCALING.md §iterative loops.
  *
  * OPERATIONAL NOTE: Spark never deletes reliable-checkpoint files on
  * its own — a long-lived session iterating many jobs accumulates one
  * frame copy per round. Deployments enabling the checkpoint dir
  * should also set `spark.cleaner.referenceTracking.cleanCheckpoints=
  * true`, which removes a checkpoint's files once the frame is
  * garbage-collected (eager deletion here would be WRONG: callers keep
  * earlier rounds' frames — e.g. the CC edge set — live across the
  * whole loop).
  */
object Iteration {

  /** Pin `df` eagerly: reliable `checkpoint()` when the session has a
    * checkpoint dir, `localCheckpoint(true)` otherwise.
    */
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(true)

  /** Scan-parallelism floor for CPU-dense per-row stages (regex
    * tokenization, per-token hashing, vector kernels): when the input
    * arrives as fewer partitions than the session's parallelism — a
    * single small file, or a one-row-group parquet that byte-range
    * splits cannot parallelize — the whole projection serializes on
    * one task while the rest of the cluster idles. Fan the rows out
    * round-robin first; an input that is already at least as wide as
    * the parallelism passes through UNTOUCHED, so at cluster scale
    * (thousands of splits) this is the identity and no extra exchange
    * ever appears in the plan. The guard, not the constant, is what
    * makes it scale-adaptive (guide §2.5 input skew: "one huge
    * unsplittable file … repartition immediately after the read").
    */
  def fanOutNarrow(df: DataFrame, cap: Int = Int.MaxValue): DataFrame = {
    val p = math.min(df.sparkSession.sparkContext.defaultParallelism, cap)
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
