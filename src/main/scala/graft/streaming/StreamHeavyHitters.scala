package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.store.{Iteration, TableStore}

/** Streaming frequent-items maintenance — the unbounded form of
  * q_heavy_hitters: a persisted ≤ k-row Misra-Gries counter table
  * (`<table>_hh`) merged per micro-batch with the mergeable-summaries
  * combine (Agarwal et al. 2012), so the store always holds a sketch
  * of the FULL stream history with the standard guarantee: any item
  * whose true total count exceeds N/(k+1) is present. Per batch:
  *
  *  1. exact per-item counts of the batch (batch-sized groupBy);
  *  2. union with the stored counters, sum per item;
  *  3. if more than k rows survive, subtract the (k+1)-th largest
  *     count from all and drop non-positive — the error-preserving
  *     combine (c* rides a k+1-row driver-side read; the subtract
  *     and filter stay distributed);
  *  4. swap-write the new counter table (materialized FIRST — the
  *     frame derives from the table being replaced, the index-first
  *     rule every maintained store path follows).
  *
  * COUNT MERGES ARE NOT IDEMPOTENT (unlike the insert-ignore dup
  * ledgers), so redelivered batches must not merge twice. The merged
  * batchId rides the sketch table itself as a constant column, so
  * counters and watermark commit in ONE atomic swap — a separate
  * ledger table would leave a crash window between the two writes in
  * which a redelivered batch double-counts (ledger-after-sketch) or
  * is silently lost (ledger-before-sketch). A batch whose combine
  * drops every counter (all-tied overflow) writes a NULL-item
  * sentinel row so the watermark still advances; readers filter
  * `item IS NOT NULL`.
  *
  * Spark batchIds are scoped to a CHECKPOINT, not to the sketch: a
  * restart with a fresh checkpoint dir (or a second query feeding
  * the same sketch) restarts batchIds at 0, and a batch_id-only
  * watermark would silently skip every batch until the new query's
  * ids caught up. The watermark therefore also carries `run_id`
  * (the checkpoint path for managed queries); the redelivery skip
  * applies only when the stored run matches the current one. A new
  * run's batch 0 merges on top of the carried-over counters — at
  * worst the boundary batch of the OLD run double-counts if the old
  * query crashed post-commit pre-checkpoint, which is the correct
  * bias for a sketch whose guarantee is one-sided (never misses a
  * heavy hitter). A legacy sketch with no run_id column is treated
  * as a foreign run (merge; Doctor flags the missing column).
  */
object StreamHeavyHitters {

  def sketchName(table: String): String = s"${table}_hh"

  /** Stored (run_id, max batch_id) watermark, if the sketch exists
    * and is watermark-shaped. Degenerate states — no batch_id column,
    * zero rows, NULL batch_id — are exactly what Doctor reports on
    * out-of-band rewrites; the sink must treat them as "no watermark"
    * (merge, overwriting the broken sketch) rather than crash the
    * query on every batch. run_id is None on pre-run_id legacy
    * sketches.
    */
  private def watermark(
      store: TableStore, table: String): Option[(Option[String], Long)] =
    store.readIfExists(sketchName(table)).flatMap { sk =>
      if (!sk.columns.contains("batch_id")) None
      else sk.agg(max(col("batch_id"))).collect().headOption
        .filter(!_.isNullAt(0)).map { r =>
          val runId =
            if (sk.columns.contains("run_id"))
              sk.select(col("run_id")).limit(1).collect()
                .headOption.flatMap(row => Option(row.getString(0)))
            else None
          (runId, r.getLong(0))
        }
    }

  /** The current (item, cnt) counters (sentinel rows filtered). */
  def counters(store: TableStore, table: String): DataFrame =
    store.read(sketchName(table))
      .filter(col("item").isNotNull)
      .select(col("item"), col("cnt"))

  /** foreachBatch handler: merge the batch's `termCol` values into
    * the persisted k-counter sketch. `runId` scopes the redelivery
    * watermark to one checkpoint lineage (see the class doc).
    */
  def heavyHittersSink(
      store: TableStore, table: String, termCol: String, k: Int,
      runId: String = "adhoc")
      : (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val alreadyMerged = watermark(store, table).exists {
        case (storedRun, storedBatch) =>
          storedRun.contains(runId) && batchId <= storedBatch
      }
      if (!batch.isEmpty && !alreadyMerged) {
        val counts = batch
          .select(col(termCol).cast("string").as("item"))
          .filter(col("item").isNotNull)
          .groupBy(col("item"))
          .agg(count(lit(1)).as("cnt"))
        // pinned ONCE: the frame feeds the top-(k+1) read AND the
        // bounded rewrite, and it reads the table the swap replaces.
        // A non-sketch-shaped table (the out-of-band state Doctor
        // reports) contributes nothing and gets overwritten by the
        // swap below — same no-crash contract as the watermark read.
        val summed = Iteration.materialize(
          store.readIfExists(sketchName(table))
            .filter(sk => sk.columns.contains("item") &&
              sk.columns.contains("cnt"))
            .map(_.filter(col("item").isNotNull)
              .select(col("item"), col("cnt")).unionByName(counts))
            .getOrElse(counts)
            .groupBy(col("item"))
            .agg(sum(col("cnt")).as("cnt")))
        // (k+1)-th largest count, if the merge overflows k: a k+1-row
        // driver read — the sketch is k-bounded by construction
        val topK1: Array[Row] = summed
          .orderBy(col("cnt").desc, col("item"))
          .limit(k + 1).collect()
        val bounded =
          if (topK1.length <= k) summed
          else {
            val cStar = topK1.last.getLong(1)
            summed.filter(col("cnt") > cStar)
              .select(col("item"), (col("cnt") - cStar).as("cnt"))
          }
        val spark = store.spark
        import spark.implicits._
        val sentinel = Seq((null: String, null.asInstanceOf[java.lang.Long]))
          .toDF("item", "cnt")
          .select(col("item"), col("cnt").cast("long"))
        val stamped = bounded
          .withColumn("batch_id", lit(batchId))
          .withColumn("run_id", lit(runId))
          .unionByName(sentinel
            .withColumn("batch_id", lit(batchId))
            .withColumn("run_id", lit(runId)))
        store.overwrite(sketchName(table), stamped)
      }
    }

  /** Wire a streaming frame into the sink. The checkpoint path IS
    * the run identity — batchIds are only comparable within one
    * checkpoint lineage.
    */
  def writeHeavyHitters(
      terms: DataFrame, store: TableStore, table: String, termCol: String,
      checkpointDir: String, k: Int = 64): StreamingQuery = {
    val writer: DataStreamWriter[Row] = terms.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
    writer.foreachBatch { (batch: DataFrame, id: Long) =>
      heavyHittersSink(store, table, termCol, k, runId = checkpointDir)(batch, id)
    }.start()
  }
}
