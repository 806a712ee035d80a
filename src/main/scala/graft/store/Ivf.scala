package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) vector index as a maintained store component —
  * the coarse-quantizer sibling of [[Pq]] (which compresses bytes
  * READ per candidate; this one cuts WHICH candidates are read at
  * all). Centroids come from [[Kmeans.train]]; the vectors persist
  * Hive-PARTITIONED BY their nearest-centroid cell, so an nprobe-cell
  * search is directory-level partition pruning — a 1024-cell index
  * reads nprobe/1024 of the corpus, before any row is deserialized.
  *
  * Three tables ride the [[TableStore]]:
  *  - `<table>_ivf_cents` (cent_id, cent_e, cent_norm): trained
  *    centroids, broadcast at assignment and probe time;
  *  - `<table>_ivf` (pk, e, norm, cell=...): the vectors themselves,
  *    partitioned by cell, maintained with dynamic partition
  *    overwrite — a batch rewrites only the cells it touches;
  *  - `<table>_ivf_map` (pk, cell): the pk → cell lookup that makes
  *    re-assignment O(batch): when a re-upserted vector MOVES cells,
  *    its old partition must drop the stale row, and without the map
  *    finding that old cell would scan the whole index.
  *
  * Assignment is deterministic (max cosine, ties to the lower
  * cent_id) and affected-cell counts are bounded by k, so the driver-
  * side cell lists are tiny by construction.
  */
object Ivf {

  def indexName(table: String): String = s"${table}_ivf"
  def centsName(table: String): String = s"${table}_ivf_cents"
  def mapName(table: String): String = s"${table}_ivf_map"

  private val CellCol = "cell"

  private def dot(a: Column, b: Column): Column =
    graft.functions.SliceDists.dotFold(
      org.apache.spark.sql.SparkSession.active, a, b)

  /** Assign each (pk, e) row its nearest centroid by cosine:
    * (pk, e, norm, cell). Broadcast centroids, max_by partial agg —
    * one row per vector crosses the exchange.
    */
  private def assign(batch: DataFrame, cents: DataFrame,
      pkCol: String, embCol: String): DataFrame =
    batch.select(col(pkCol).as("pk"), col(embCol).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
      .crossJoin(broadcast(cents))
      .select(col("pk"), col("e"), col("norm"), col("cent_id"),
        (dot(col("e"), col("cent_e")) / (col("norm") * col("cent_norm")))
          .as("_cs"))
      .groupBy(col("pk"))
      .agg(max_by(struct(col("e"), col("norm"), col("cent_id").as(CellCol)),
        struct(col("_cs"), (-col("cent_id")).as("_nc"))).as("_best"))
      .select(col("pk"), col("_best.e").as("e"), col("_best.norm").as("norm"),
        col(s"_best.$CellCol").as(CellCol))

  /** Train centroids on the batch corpus, persist them, and index the
    * batch.
    */
  def buildIndex(
      store: TableStore, table: String, emb: DataFrame,
      pkCol: String, embCol: String, k: Int = 16, iters: Int = 3): Unit = {
    val cents = Kmeans.train(
      emb.select(col(pkCol).as("vec_id"), col(embCol).as("e")), k, iters)
      .withColumn("cent_norm", sqrt(dot(col("cent_e"), col("cent_e"))))
    store.overwrite(centsName(table), cents)
    upsertWithCells(store, table, emb, pkCol, embCol)
    // train-time occupancy snapshot: the IvfDrift baseline a later
    // `doctor suggest` compares against to recommend a retrain
    IvfDrift.snapshot(store, centsName(table), mapName(table))
    // provenance for the one-command retrain loop (IvfDrift.retrain)
    IvfDrift.recordTraining(store, s"${table}_ivf", Map(
      "table" -> table, "family" -> "ivf", "pk" -> pkCol, "emb" -> embCol,
      "k" -> k.toString, "iters" -> iters.toString))
  }

  /** Upsert embedding rows AND their cell index: the batch assigns
    * against the persisted centroids (O(batch)), and only the touched
    * cells — the batch's new cells plus the old cells of re-upserted
    * pks, looked up in the map — are rewritten via dynamic partition
    * overwrite. Cells whose merged content would be empty are dropped
    * explicitly (dynamic overwrite never visits them).
    */
  def upsertWithCells(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String): Unit = {
    refreshCells(store, table, batch, pkCol, embCol)
    store.upsert(table, batch, Seq(pkCol))
  }

  /** The cell-index half of [[upsertWithCells]] — no base write (the
    * SQL DML maintenance seam, [[IndexMaintain]]).
    */
  private[store] def refreshCells(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String): Unit = {
    val cents = store.read(centsName(table))
    val fresh = Iteration.materialize(assign(batch, cents, pkCol, embCol))
    CellIndex.maintain(store, indexName(table), mapName(table), fresh)
  }

  /** ANN top-k over the persisted index: each query probes its
    * `nprobe` nearest cells (broadcast centroids, tiny driver-side
    * cell list — ≤ |queries|·nprobe values, ≤ k distinct), the vector
    * scan PRUNES to those partitions, and candidates re-rank by exact
    * cosine with a WindowGroupLimit top-k. Returns
    * (query_id, rnk, cand_id, cosine).
    */
  def annTopK(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, nprobe: Int = 2): DataFrame =
    annSearch(store, table, queries, pkCol, embCol, k, nprobe, allowed = None)

  /** Filtered cell-pruned top-k: candidates restricted to the pks in
    * `allowed` (one column), semi-joined onto the cell-pruned vector
    * scan before the exact-cosine scoring. Same filter × probe
    * interplay as the quantized composed indexes — allowed rows in
    * unprobed cells are invisible, so the filtered default probes 2×
    * wider.
    */
  def annTopKFiltered(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, allowed: DataFrame,
      nprobe: Int = 4): DataFrame =
    annSearch(store, table, queries, pkCol, embCol, k, nprobe, Some(allowed))

  private def annSearch(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, nprobe: Int,
      allowed: Option[DataFrame]): DataFrame = {
    val cents = store.read(centsName(table))
    val probes = queries
      .select(col(pkCol).as("query_id"), col(embCol).as("qe"))
      .withColumn("qnorm", sqrt(dot(col("qe"), col("qe"))))
    val probeCells = probes.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qe"), col("qnorm"),
        col("cent_id").as(CellCol),
        (dot(col("qe"), col("cent_e")) / (col("qnorm") * col("cent_norm")))
          .as("_cs"))
      .withColumn("_rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("_cs").desc, col(CellCol))))
      .filter(col("_rnk") <= nprobe)
      .select(col("query_id"), col("qe"), col("qnorm"),
        col(CellCol).cast("long").as(CellCol))
    // literal cell list → directory-level partition pruning on the scan
    val cells = probeCells.select(col(CellCol)).distinct()
      .collect().map(_.getLong(0)).toSeq
    val cands0 = store.read(indexName(table))
      .filter(col(CellCol).isin(cells: _*))
      .withColumn(CellCol, col(CellCol).cast("long"))
    val cands = allowed.fold(cands0)(
      AnnFilter.semiJoinAllowed(cands0, _, "pk"))
    // broadcast the per-query probe rows like the sibling composed
    // indexes do — without the hint a stats-less probeCells side can
    // demote this to a shuffle of the whole cell-pruned vector scan
    cands.join(broadcast(probeCells), Seq(CellCol))
      .filter(col("pk") =!= col("query_id"))
      .select(col("query_id"), col("pk").as("cand_id"),
        (dot(col("qe"), col("e")) / (col("qnorm") * col("norm")))
          .as("cosine"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("cand_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
