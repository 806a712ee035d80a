package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.queries.DedupOps
import graft.store.{Lsh, TableStore}

/** Streaming NEAR-duplicate detection end-to-end — the composition a
  * production ingest pipeline runs continuously: each micro-batch
  *
  *  1. maintains the persisted LSH band index ([[graft.store.Lsh]]
  *     `upsertWithBands`: O(batch) bucket rewrites);
  *  2. probes it for candidate pairs TOUCHING the batch
  *     (`Lsh.candidatesFor`: bucket-pruned scan — the corpus is
  *     never re-signatured or re-paired);
  *  3. Jaccard-VERIFIES the candidates against the stored text
  *     ([[graft.queries.DedupOps.jaccardVerify]]: O(candidates)
  *     tokenization via semi-join — one spurious band collision must
  *     not mark a false duplicate);
  *  4. records verified pairs in `<table>_dups` (insert-ignore keyed
  *     on the pair, so redelivered batches converge).
  *
  * Compared to [[StreamDedup]] (exact fingerprints in bounded
  * keyed state), this is the NEAR-dup sibling: state lives in the
  * store's band index rather than the state store, because near-dup
  * candidacy needs the whole corpus's bands, not a watermark-bounded
  * window.
  */
object StreamNearDup {

  def dupsName(table: String): String = s"${table}_dups"

  /** foreachBatch handler: maintain index, probe, verify, record. */
  def nearDupSink(
      store: TableStore, table: String, pkCol: String, textCol: String,
      threshold: Double = 0.5,
      shingleSize: Int = 3, nHashes: Int = 4, bands: Int = 2,
      buckets: Int = 16): (DataFrame, Long) => Unit =
    (batch, _) =>
      if (!batch.isEmpty) {
        Lsh.upsertWithBands(store, table, batch, pkCol, textCol,
          shingleSize, nHashes, bands, buckets)
        val cands = Lsh.candidatesFor(store, table,
          batch.select(col(pkCol)).distinct())
        val verified = DedupOps.jaccardVerify(
          cands,
          store.read(table)
            .select(col(pkCol).as("doc_id"), col(textCol).as("text")),
          threshold)
        store.insertIgnore(dupsName(table), verified, Seq("doc_a", "doc_b"))
      }

  /** Wire a streaming (pk, text, …) frame into the near-dup sink. */
  def writeNearDupIndexed(
      docs: DataFrame, store: TableStore, table: String,
      pkCol: String, textCol: String, checkpointDir: String,
      threshold: Double = 0.5,
      shingleSize: Int = 3, nHashes: Int = 4, bands: Int = 2,
      buckets: Int = 16): StreamingQuery = {
    val writer: DataStreamWriter[Row] = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
    writer.foreachBatch { (batch: DataFrame, id: Long) =>
      nearDupSink(store, table, pkCol, textCol, threshold,
        shingleSize, nHashes, bands, buckets)(batch, id)
    }.start()
  }
}
