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
  */
object StreamHeavyHitters {

  def sketchName(table: String): String = s"${table}_hh"

  private def lastMerged(store: TableStore, table: String): Long =
    store.readIfExists(sketchName(table))
      .map(_.agg(max(col("batch_id"))).head.getLong(0)).getOrElse(-1L)

  /** The current (item, cnt) counters (sentinel rows filtered). */
  def counters(store: TableStore, table: String): DataFrame =
    store.read(sketchName(table))
      .filter(col("item").isNotNull)
      .select(col("item"), col("cnt"))

  /** foreachBatch handler: merge the batch's `termCol` values into
    * the persisted k-counter sketch.
    */
  def heavyHittersSink(
      store: TableStore, table: String, termCol: String, k: Int)
      : (DataFrame, Long) => Unit =
    (batch, batchId) =>
      if (!batch.isEmpty && batchId > lastMerged(store, table)) {
        val counts = batch
          .select(col(termCol).cast("string").as("item"))
          .filter(col("item").isNotNull)
          .groupBy(col("item"))
          .agg(count(lit(1)).as("cnt"))
        // pinned ONCE: the frame feeds the top-(k+1) read AND the
        // bounded rewrite, and it reads the table the swap replaces
        val summed = Iteration.materialize(
          store.readIfExists(sketchName(table))
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
        val stamped = bounded.withColumn("batch_id", lit(batchId))
          .unionByName(sentinel.withColumn("batch_id", lit(batchId)))
        store.overwrite(sketchName(table), stamped)
      }

  /** Wire a streaming frame into the sink. */
  def writeHeavyHitters(
      terms: DataFrame, store: TableStore, table: String, termCol: String,
      checkpointDir: String, k: Int = 64): StreamingQuery = {
    val writer: DataStreamWriter[Row] = terms.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
    writer.foreachBatch { (batch: DataFrame, id: Long) =>
      heavyHittersSink(store, table, termCol, k)(batch, id)
    }.start()
  }
}
