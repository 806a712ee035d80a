package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.store.{Lsh, TableStore}

/** Streaming maintenance of the persisted LSH band index — the
  * near-dup sibling of [[StreamFts]] (postings) and [[StreamVectors]]
  * (PQ/IVF): as documents stream in, each micro-batch runs the SAME
  * store maintenance the batch path uses (`Lsh.upsertWithBands`:
  * signature the batch, rewrite only the touched band buckets), so
  * the index answers "what does this new document collide with?"
  * (`Lsh.candidatesFor`) continuously, without ever re-signaturing
  * the corpus.
  *
  * Exactly-once composition: checkpointed source offsets + idempotent
  * by-pk replacement — redelivering a batch converges to the same
  * index (StreamLshSpec asserts it), the contract shared with
  * StreamNormalize/StreamFts/StreamVectors.
  */
object StreamLsh {

  /** foreachBatch handler maintaining the band index. Parameters must
    * match the built index's, or the first micro-batch triggers a
    * wholesale rebuild under the new parameters (Lsh.upsertWithBands
    * semantics).
    */
  def bandSink(
      store: TableStore, table: String, pkCol: String, textCol: String,
      shingleSize: Int = 3, nHashes: Int = 4, bands: Int = 2,
      buckets: Int = 16): (DataFrame, Long) => Unit =
    (batch, _) =>
      if (!batch.isEmpty)
        Lsh.upsertWithBands(store, table, batch, pkCol, textCol,
          shingleSize, nHashes, bands, buckets)

  /** Wire a streaming (pk, text, …) frame into the band-index sink. */
  def writeBandIndexed(
      docs: DataFrame, store: TableStore, table: String,
      pkCol: String, textCol: String, checkpointDir: String,
      shingleSize: Int = 3, nHashes: Int = 4, bands: Int = 2,
      buckets: Int = 16): StreamingQuery = {
    val writer: DataStreamWriter[Row] = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
    writer.foreachBatch { (batch: DataFrame, id: Long) =>
      bandSink(store, table, pkCol, textCol,
        shingleSize, nHashes, bands, buckets)(batch, id)
    }.start()
  }
}
