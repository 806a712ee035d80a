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
  * ledgers), so redelivered batches must not merge twice: a 1-row
  * `<table>_hh_batch` ledger records the last merged batchId and the
  * sink skips any batch at or below it — the transactional
  * foreachBatch recipe, exactly-once by batchId.
  */
object StreamHeavyHitters {

  def sketchName(table: String): String = s"${table}_hh"
  def ledgerName(table: String): String = s"${table}_hh_batch"

  private def lastMerged(store: TableStore, table: String): Long =
    store.readIfExists(ledgerName(table))
      .map(_.select(col("batch_id")).head.getLong(0)).getOrElse(-1L)

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
        val summed = store.readIfExists(sketchName(table))
          .map(_.unionByName(counts)).getOrElse(counts)
          .groupBy(col("item"))
          .agg(sum(col("cnt")).as("cnt"))
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
        // materialize BEFORE the swap: `summed` reads the table the
        // overwrite replaces
        store.overwrite(sketchName(table), Iteration.materialize(bounded))
        val spark = store.spark
        import spark.implicits._
        store.overwrite(ledgerName(table), Seq(batchId).toDF("batch_id"))
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
