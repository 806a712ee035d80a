package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.store.{Iteration, TableStore}

/** Streaming CONTENT-DEFINED-CHUNK deduplication — the shift-resistant
  * sibling of [[StreamDedup]] (whole-document fingerprints): each
  * micro-batch chunks its documents with the same Rabin-style rolling
  * hash as the batch q_cdc_chunks operator
  * ([[graft.functions.CdcChunks]]), counts how much of each document
  * the lake has ALREADY seen chunk-by-chunk, and extends the
  * first-wins chunk ledger. A re-posted article with a new preamble
  * shares no document fingerprint and no fixed-offset window with its
  * original, but its CDC chunks re-align after the first boundary —
  * so the stats row exposes it as mostly-seen on arrival.
  *
  * Per micro-batch:
  *  1. chunk (`doc_id, fp, clen`) via the native expression — map-only;
  *  2. count per-doc chunks seen in the PRE-batch ledger via an
  *     fp-keyed semi-join; when the ledger table is bucketized on fp
  *     (`ensureBucketed(ledgerName, Seq("fp"), n)` — recommended at
  *     scale), the probe filters to the batch's touched buckets first,
  *     so the read is O(touched buckets' data) exactly like the
  *     [[StreamEmbedDup]] cell probe, never a full-ledger scan;
  *  3. record (doc_id, n_chunks, n_chars, n_seen) in
  *     `<table>_cdc_stats`, insert-ignore on doc_id;
  *  4. extend `<table>_cdc_ledger` (fp → first-owner doc, chunk chars),
  *     insert-ignore on fp — a bucketized ledger upserts O(touched).
  *
  * Exactly-once: stats are written BEFORE the ledger grows, so a crash
  * between the two replays into an insert-ignore no-op on stats (the
  * pre-batch n_seen of the FIRST delivery is kept — a redelivered
  * batch would otherwise count its own chunks as "seen") and the
  * ledger insert-ignore converges. Null-text documents produce no
  * chunks and no stats row (media-only records have no text content to
  * share).
  *
  * State lives in the store, not the state store: like near-dup
  * candidacy, chunk-overlap detection needs the whole corpus, not a
  * watermark-bounded window.
  */
object StreamCdcDedup {

  def ledgerName(table: String): String = s"${table}_cdc_ledger"
  def statsName(table: String): String = s"${table}_cdc_stats"

  /** foreachBatch handler: chunk, count pre-batch overlap, record. */
  def cdcDedupSink(
      store: TableStore, table: String, pkCol: String, textCol: String)
      : (DataFrame, Long) => Unit =
    (batch, _) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        // pinned ONCE: the chunk frame feeds the seen-count, the stats
        // aggregation, and the ledger growth
        val chunks = Iteration.materialize(batch
          .select(col(pkCol).cast("long").as("doc_id"),
            explode(graft.functions.CdcChunks.cdcChunks(spark, col(textCol)))
              .as("c"))
          .select(col("doc_id"), col("c.fp").as("fp"), col("c.clen").as("clen")))
        val ledgerN = ledgerName(table)
        val seenCounts = store.readIfExists(ledgerN).map { ledger0 =>
          val ledger = store.bucketLayoutOf(ledgerN) match {
            case Some((n, Seq("fp"))) =>
              // touched buckets from the BATCH fps — a ≤ n driver set,
              // the same bounded pattern as the bucketed upsert itself
              val touched = chunks
                .select(store.bucketOfPk(Seq("fp"), n).as("b"))
                .distinct().collect().map(_.getLong(0)).toSeq
              ledger0.filter(col(store.BucketCol).isin(touched: _*))
            case _ => ledger0
          }
          chunks.join(ledger.select(col("fp")), Seq("fp"), "left_semi")
            .groupBy(col("doc_id")).agg(count(lit(1)).as("n_seen"))
        }
        val perDoc = chunks.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"), sum(col("clen")).as("n_chars"))
        val stats = seenCounts match {
          case None => perDoc.withColumn("n_seen", lit(0L))
          case Some(sc) => perDoc.join(sc, Seq("doc_id"), "left")
            .na.fill(0L, Seq("n_seen"))
        }
        store.insertIgnore(statsName(table),
          stats.select(col("doc_id"), col("n_chunks"), col("n_chars"),
            col("n_seen")),
          Seq("doc_id"))
        // first-wins ownership: min doc per fp (clen is a function of
        // the chunk text, so any row's value is THE value)
        store.insertIgnore(ledgerN,
          chunks.groupBy(col("fp"))
            .agg(min(col("doc_id")).as("doc_id"), max(col("clen")).as("clen")),
          Seq("fp"))
      }

  /** Wire a streaming (pk, text, …) frame into the sink. */
  def writeCdcDeduped(
      docs: DataFrame, store: TableStore, table: String,
      pkCol: String, textCol: String, checkpointDir: String): StreamingQuery = {
    val writer: DataStreamWriter[Row] = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
    writer.foreachBatch { (batch: DataFrame, id: Long) =>
      cdcDedupSink(store, table, pkCol, textCol)(batch, id)
    }.start()
  }
}
