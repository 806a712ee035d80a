package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.store.{TableStore, Trigram}

/** Streaming trigram-postings maintenance — the last persisted index
  * family to gain a stream sink, closing the "every maintained index
  * maintains from streams" invariant. Each micro-batch runs the SAME
  * `Trigram.upsertWithIndex` the batch path uses (delete-and-replace
  * of the batch pks' gram rows, O(touched buckets) via the pk-hash
  * bucketed postings layout), so arbitrary-substring search
  * (`Trigram.search` / `matchSearch` boolean grammar) answers over
  * everything ingested so far after every batch.
  *
  * Exactly-once composition: checkpointed source offsets + an
  * idempotent sink (upsertWithIndex replaces by pk — a redelivered
  * micro-batch converges to the same postings), the StreamFts
  * contract verbatim.
  */
object StreamTrigram {

  /** The foreachBatch handler: index-and-upsert one micro-batch.
    * Empty batches (pure watermark advances) are skipped.
    */
  def indexSink(
      store: TableStore, table: String, pkCol: String, textCol: String)
      : (DataFrame, Long) => Unit =
    (batch, _) =>
      if (!batch.isEmpty)
        Trigram.upsertWithIndex(store, table, batch, pkCol, textCol)

  /** Wire a streaming (pk, text, …) frame into the index sink. */
  def writeIndexed(
      docs: DataFrame, store: TableStore, table: String, pkCol: String,
      textCol: String, checkpointDir: String): StreamingQuery = {
    val writer: DataStreamWriter[Row] = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
    writer.foreachBatch { (batch: DataFrame, id: Long) =>
      indexSink(store, table, pkCol, textCol)(batch, id)
    }.start()
  }
}
