package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.store.{Ivf, TableStore}

/** Streaming EMBEDDING near-duplicate detection — the semantic
  * sibling of [[StreamNearDup]] (which probes the lexical LSH band
  * index): each micro-batch
  *
  *  1. maintains the persisted IVF cell index
  *     ([[graft.store.Ivf]] `upsertWithCells`: O(batch) cell
  *     rewrites);
  *  2. probes ONLY the batch's cells for same-cell candidates — the
  *     map lookup is O(batch), the scan is directory-pruned to those
  *     cells, and candidate pairing is batch × cellmates (linear in
  *     cell occupancy per batch row, never a corpus×corpus product;
  *     a pathological mega-cell is the same skew the batch path
  *     routes through PairExpansion — the per-micro-batch volume here
  *     is bounded by the batch size);
  *  3. verifies by exact cosine against the stored vectors (the index
  *     rows carry e + norm, so verification reads no other table);
  *  4. records pairs ≥ threshold in `<table>_emb_dups`,
  *     insert-ignore keyed on the (lo, hi) pair so redelivered
  *     batches converge.
  *
  * State lives in the store's cell index, not the state store: like
  * lexical near-dup candidacy, semantic candidacy needs the whole
  * corpus, not a watermark-bounded window.
  */
object StreamEmbedDup {

  def dupsName(table: String): String = s"${table}_emb_dups"

  private def dot(a: Column, b: Column): Column =
    graft.functions.SliceDists.dotFold(
      org.apache.spark.sql.SparkSession.active, a, b)

  /** foreachBatch handler: maintain cells, probe, verify, record. */
  def embedDupSink(
      store: TableStore, table: String, pkCol: String, embCol: String,
      threshold: Double): (DataFrame, Long) => Unit =
    (batch, _) =>
      if (!batch.isEmpty) {
        // register on BOTH sessions: plans here mix store-session
        // frames with the micro-batch's isolated clone, whose
        // registry was cloned cold at stream start — registering only
        // on SparkSession.active leaves dot_fold unresolved on a
        // registry-cold store session (the StreamBinDup lesson; its
        // spec pins the failure mode). No-op under GraftExtensions.
        Seq(store.spark, batch.sparkSession)
          .foreach(graft.functions.GraftFunctions.registerAll)
        Ivf.upsertWithCells(store, table, batch, pkCol, embCol)
        val batchPks = batch.select(col(pkCol).as("pk")).distinct()
        // the batch's cells via the map — O(batch) driver-side list,
        // bounded by |batch| distinct values
        val cells = store.read(Ivf.mapName(table))
          .join(batchPks, Seq("pk"), "left_semi")
          .select(col("cell").cast("long")).distinct()
          .collect().map(_.getLong(0)).toSeq
        // directory-pruned same-cell scan; index rows carry (e, norm)
        val idx = store.read(Ivf.indexName(table))
          .filter(col("cell").isin(cells: _*))
          .withColumn("cell", col("cell").cast("long"))
        val fresh = idx.join(batchPks, Seq("pk"))
        val pairs = fresh
          .select(col("cell"), col("pk").as("pk_a"), col("e").as("ea"),
            col("norm").as("na"))
          .join(idx.select(col("cell"), col("pk").as("pk_b"),
            col("e").as("eb"), col("norm").as("nb")), Seq("cell"))
          .filter(col("pk_a") =!= col("pk_b"))
          .filter(dot(col("ea"), col("eb")) / (col("na") * col("nb"))
            >= threshold)
          .select(least(col("pk_a"), col("pk_b")).as("vec_a"),
            greatest(col("pk_a"), col("pk_b")).as("vec_b"))
          .distinct()
        store.insertIgnore(dupsName(table), pairs, Seq("vec_a", "vec_b"))
      }

  /** Wire a streaming (pk, embedding, …) frame into the sink. */
  def writeEmbedDupIndexed(
      vectors: DataFrame, store: TableStore, table: String,
      pkCol: String, embCol: String, checkpointDir: String,
      threshold: Double): StreamingQuery = {
    val writer: DataStreamWriter[Row] = vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
    writer.foreachBatch { (batch: DataFrame, id: Long) =>
      embedDupSink(store, table, pkCol, embCol, threshold)(batch, id)
    }.start()
  }
}
