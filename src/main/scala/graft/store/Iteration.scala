package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
    scanWidth(df.queryExecution.analyzed) match {
      case Some(w) if w < p => df.repartition(p)
      case _ => df
    }
  }

  /** Scan width of a plan that is narrow (per-row) operators over ONE
    * file relation: the file count — the task-count ceiling for the
    * single-row-group parquet this floor exists for (byte-range splits
    * cannot parallelize below one row group, so more files is the only
    * way such a scan widens; a plan wide enough in files is left
    * untouched exactly like before). `None` for every other plan shape
    * — joins, aggregates, unions: their inputs already crossed an
    * exchange sized by spark.sql.shuffle.partitions, so the floor has
    * nothing to fix there. Derived from the ANALYZED plan, never from
    * `df.rdd`: under AQE, `Dataset.rdd` materializes every upstream
    * shuffle stage just to learn a partition count, so probing an
    * arbitrary caller frame (e.g. an index rebuild's upsert join)
    * executed it once for the probe and again after the repartition.
    */
  private def scanWidth(plan: LogicalPlan): Option[Int] = plan match {
    case p: Project => scanWidth(p.child)
    case f: Filter => scanWidth(f.child)
    case g: Generate => scanWidth(g.child)
    case s: SubqueryAlias => scanWidth(s.child)
    case v: View => scanWidth(v.child)
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => Some(h.location.inputFiles.length)
      case _ => None
    }
    // an in-memory batch (tests, CLI literals) parallelizes like a
    // single split: apply the floor
    case _: LocalRelation => Some(1)
    case _ => None
  }
}
