package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.store.{Fts, TableStore}

/** Streaming FTS maintenance (SURVEY.md §2.7 × §4.3.2): keep the
  * full-text index SEARCHABLE as documents stream in, the streaming
  * analog of FTS5's sync triggers (`/root/reference/utils.py:330-332`
  * — the reference's stream ingest writes through the same
  * triggered-FTS tables its batch commands use).
  *
  * Each micro-batch runs the SAME `Fts.upsertWithIndex` the batch path
  * uses — delete-and-replace of the batch pks' postings, incremental
  * corpus stats, optionally the bucketed O(batch) partition
  * maintenance — so streaming and batch index maintenance share one
  * definition, and the trigger-parity property (incremental ==
  * from-scratch) covers both by construction.
  *
  * Exactly-once composition: checkpointed source offsets + an
  * idempotent sink (upsertWithIndex replaces by pk, so a redelivered
  * micro-batch converges to the same index — same contract as
  * StreamNormalize.writeBatch).
  */
object StreamFts {

  /** The foreachBatch handler: index-and-upsert one micro-batch.
    * Empty batches (pure watermark advances) are skipped — the flat
    * layout would otherwise pay a full index rewrite for nothing.
    */
  def indexSink(
      store: TableStore,
      table: String,
      pkCol: String,
      textCol: String,
      buckets: Int = 0): (DataFrame, Long) => Unit =
    (batch, _) =>
      if (!batch.isEmpty)
        Fts.upsertWithIndex(store, table, batch, pkCol, textCol, buckets)

  /** Wire a streaming (pk, text, …) frame into the index sink. */
  def writeIndexed(
      docs: DataFrame,
      store: TableStore,
      table: String,
      pkCol: String,
      textCol: String,
      checkpointDir: String,
      buckets: Int = 0): StreamingQuery = {
    val writer: DataStreamWriter[Row] = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
    writer.foreachBatch { (batch: DataFrame, id: Long) =>
      indexSink(store, table, pkCol, textCol, buckets)(batch, id)
    }.start()
  }
}
