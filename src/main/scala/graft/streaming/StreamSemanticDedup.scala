package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.store.{IvfPq, TableStore}

/** Streaming SemDeDup over the combined IVF+PQ index — the
  * compressed-screen sibling of [[StreamEmbedDup]] (which pairs a
  * batch against every same-cell vector and verifies each pair with
  * full-precision floats). At production corpus sizes a hot cell makes
  * that float-pair volume the bottleneck; the SemDeDup screen reads
  * 8-byte PQ codes instead. Each micro-batch:
  *
  *  1. maintains the persisted IVF+PQ index
  *     ([[graft.store.IvfPq]] `upsertWithCodes`: assign + encode
  *     against the PERSISTED centroids/books, O(batch) cell
  *     rewrites);
  *  2. SCREENS each batch vector against its own cell's code rows by
  *     asymmetric distance ([[IvfPq.annTopK]] with nprobe=1 — the
  *     row's own cell by the same max-cosine tie-break it was indexed
  *     under): candidates scanned as `slices` small ints each, never
  *     floats, and only each batch row's `screenTopM` ADC-nearest
  *     survive;
  *  3. verifies the short list by exact cosine against the BASE
  *     table's embeddings (a semi-join reads only the pair pks — the
  *     classic screen-then-verify contract: the screen bounds cost,
  *     the verify guarantees no false pair is ever recorded);
  *  4. records pairs ≥ `threshold` in `<table>_sem_dups`,
  *     insert-ignore keyed on (vec_a, vec_b) so redelivered batches
  *     converge.
  *
  * `screenTopM` is the recall knob: a true duplicate ranked past M
  * among its cell's ADC neighbors is missed (SemDeDup's documented
  * approximation — dedup needs each vector's FEW nearest neighbors,
  * not all pairs). State lives in the store's index tables, not the
  * state store: semantic candidacy needs the whole corpus, not a
  * watermark-bounded window.
  */
object StreamSemanticDedup {

  def dupsName(table: String): String = s"${table}_sem_dups"

  private def dot(a: Column, b: Column): Column =
    graft.functions.SliceDists.dotFold(
      org.apache.spark.sql.SparkSession.active, a, b)

  /** foreachBatch handler: maintain the index, ADC-screen, verify
    * exactly, record.
    */
  def semanticDupSink(
      store: TableStore, table: String, pkCol: String, embCol: String,
      threshold: Double, screenTopM: Int = 32,
      slices: Int = 8, subDim: Int = 8): (DataFrame, Long) => Unit =
    (batch, _) =>
      if (!batch.isEmpty) {
        // both sessions — see StreamEmbedDup.embedDupSink's note on
        // the registry-cold micro-batch clone
        Seq(store.spark, batch.sparkSession)
          .foreach(graft.functions.GraftFunctions.registerAll)
        IvfPq.upsertWithCodes(store, table, batch, pkCol, embCol,
          slices, subDim)
        // ADC screen: the batch rows query their own cell (nprobe=1
        // re-derives the indexed cell — same centroids, same
        // tie-break); annTopK already excludes self-matches
        val screened = IvfPq.annTopK(store, table, batch, pkCol, embCol,
            k = screenTopM, nprobe = 1, slices = slices, subDim = subDim)
          .select(least(col("query_id"), col("cand_id")).as("vec_a"),
            greatest(col("query_id"), col("cand_id")).as("vec_b"))
          .distinct()
        // exact verification reads ONLY the pair pks' embeddings
        val base = store.read(table)
          .select(col(pkCol).as("pk"), col(embCol).as("e"))
          .withColumn("norm", sqrt(dot(col("e"), col("e"))))
        val pairs = screened
          .join(base.select(col("pk").as("vec_a"), col("e").as("ea"),
            col("norm").as("na")), Seq("vec_a"))
          .join(base.select(col("pk").as("vec_b"), col("e").as("eb"),
            col("norm").as("nb")), Seq("vec_b"))
          .filter(dot(col("ea"), col("eb")) / (col("na") * col("nb"))
            >= threshold)
          .select(col("vec_a"), col("vec_b"))
        store.insertIgnore(dupsName(table), pairs, Seq("vec_a", "vec_b"))
      }

  /** Wire a streaming (pk, embedding, …) frame into the sink.
    * Requires `IvfPq.buildIndex` to have trained and written
    * centroids + books.
    */
  def writeSemanticDupIndexed(
      vectors: DataFrame, store: TableStore, table: String,
      pkCol: String, embCol: String, checkpointDir: String,
      threshold: Double, screenTopM: Int = 32,
      slices: Int = 8, subDim: Int = 8): StreamingQuery = {
    val writer: DataStreamWriter[Row] = vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
    writer.foreachBatch { (batch: DataFrame, id: Long) =>
      semanticDupSink(store, table, pkCol, embCol, threshold,
        screenTopM, slices, subDim)(batch, id)
    }.start()
  }
}
