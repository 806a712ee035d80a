package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF + binary — the cell-partitioned member of the sign-bit family
  * (FAISS's IndexBinaryIVF): [[Ivf]]-style coarse cells cut WHICH
  * candidates are read (directory-level partition pruning), and the
  * in-cell scan ranks 1-bit/dim sign blobs by integer Hamming — the
  * cheapest possible probe at the 32× compression point. This is how
  * billion-scale binary indexes actually deploy: a flat [[Bin]] scan
  * touches every blob (fine at millions, linear forever), while the
  * IVF composition reads nprobe/k of the corpus per query.
  *
  * Cells come from FLOAT k-means over the raw vectors (the blobs are
  * too coarse to train on), and blobs pack the RAW vector's signs —
  * not the residual's: Hamming against the query's own sign blob must
  * compare like with like, and sign(e) is cell-independent. One
  * consequence worth naming: unlike [[IvfSq]]/[[IvfPq]] there is no
  * per-cell reconstruction — the cell only gates WHICH blobs are
  * read, never how they score.
  *
  * Three tables ride the [[TableStore]]:
  *  - `<t>_ivfbin_cents` (cent_id, cent_e, cent_norm): trained coarse
  *    centroids (broadcast at assignment and probe time);
  *  - `<t>_ivfbin` (pk, bits, cell=N/): sign blobs, Hive-partitioned
  *    by cell;
  *  - `<t>_ivfbin_map` (pk, cell): the O(batch) re-assignment lookup.
  * Maintenance is shared through [[CellIndex]]: only touched cells
  * rewrite. Scoring is INTEGER-only, so partitioning-independence is
  * by construction (the [[Bin]] argument).
  */
object IvfBin {

  def codesName(table: String): String = s"${table}_ivfbin"
  def centsName(table: String): String = s"${table}_ivfbin_cents"
  def mapName(table: String): String = s"${table}_ivfbin_map"

  private val CellCol = "cell"

  private def spark = org.apache.spark.sql.SparkSession.active

  private def dot(a: Column, b: Column): Column =
    graft.functions.SliceDists.dotFold(spark, a, b)

  private def packed(c: Column): Column =
    graft.functions.SliceDists.signPack(spark, c.cast("array<double>"))

  private def ham(a: Column, b: Column): Column =
    graft.functions.SliceDists.hammingFold(spark, a, b)

  /** Register kernels on the store's session — plans here root in
    * store frames and must resolve there even when a caller (e.g. a
    * foreachBatch sink) constructs columns under a different active
    * session (the StreamBinDup lesson).
    */
  private def registerOn(s: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.GraftFunctions.registerAll(s)

  /** Nearest-cell assignment: (pk, cell, bits). Broadcast centroids,
    * max_by partial agg, ties to the lower cent_id — the [[IvfSq]]
    * discipline; the blob is packed in the same pass.
    */
  private def assignBits(
      batch: DataFrame, cents: DataFrame,
      pkCol: String, embCol: String): DataFrame =
    batch.select(col(pkCol).as("pk"), col(embCol).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
      .crossJoin(broadcast(cents))
      .select(col("pk"), col("e"), col("cent_id"),
        (dot(col("e"), col("cent_e")) / (col("norm") * col("cent_norm")))
          .as("_cs"))
      .groupBy(col("pk"))
      .agg(max_by(struct(col("e"), col("cent_id").as(CellCol)),
        struct(col("_cs"), (-col("cent_id")).as("_nc"))).as("_best"))
      .select(col("pk"), col(s"_best.$CellCol").as(CellCol),
        packed(col("_best.e")).as("bits"))

  /** Train coarse centroids on the corpus, persist them, and index
    * the batch. The blobs themselves need no training (the [[Bin]]
    * property) — only the cell structure does.
    */
  def buildIndex(
      store: TableStore, table: String, emb: DataFrame,
      pkCol: String, embCol: String,
      kCells: Int = 16, iters: Int = 3): Unit = {
    val cents = Kmeans.train(
      emb.select(col(pkCol).as("vec_id"), col(embCol).as("e")), kCells, iters)
      .withColumn("cent_norm", sqrt(dot(col("cent_e"), col("cent_e"))))
    store.overwrite(centsName(table), cents)
    upsertWithCodes(store, table, emb, pkCol, embCol)
    IvfDrift.snapshot(store, centsName(table), mapName(table))
    IvfDrift.recordTraining(store, s"${table}_ivfbin", Map(
      "table" -> table, "family" -> "ivfbin", "pk" -> pkCol, "emb" -> embCol,
      "kCells" -> kCells.toString, "iters" -> iters.toString))
  }

  /** Upsert embedding rows AND their cell-partitioned blobs: assign
    * against the PERSISTED centroids (O(batch) — a stream never
    * retrains them), then [[CellIndex]] rewrites only touched cells.
    */
  def upsertWithCodes(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String): Unit = {
    refreshCodes(store, table, batch, pkCol, embCol)
    store.upsert(table, batch, Seq(pkCol))
  }

  /** The sign-blobs half of [[upsertWithCodes]] — no base write (the
    * SQL DML maintenance seam, [[IndexMaintain]]).
    */
  private[store] def refreshCodes(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String): Unit = {
    registerOn(store.spark)
    val fresh = Iteration.materialize(
      assignBits(batch, store.read(centsName(table)), pkCol, embCol))
    CellIndex.maintain(store, codesName(table), mapName(table), fresh)
  }

  /** Hamming top-k: queries probe their nprobe nearest cells by FLOAT
    * cosine to the centroids (broadcast), the blob scan
    * directory-prunes to those cells, and candidates rank by one
    * native popcount fold against the query's own sign blob. Self
    * matches are excluded (a probe is usually in the corpus), the
    * [[IvfSq]] contract. Returns (query_id, rnk, cand_id, hamming).
    */
  def annTopK(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, nprobe: Int = 2): DataFrame =
    annSearch(store, table, queries, pkCol, embCol, k, nprobe, allowed = None)

  /** Filtered cell-pruned Hamming top-k: candidates restricted to the
    * pks in `allowed` (one column), semi-joined onto the cell-pruned
    * blob scan before the popcount. Same filter × probe interplay as
    * [[IvfSq.annTopKFiltered]] — allowed rows in unprobed cells are
    * invisible, so the filtered default probes 2× wider; at extreme
    * selectivity brute-force the allowed rows instead.
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
    registerOn(store.spark)
    val cents = store.read(centsName(table))
    val probes = queries
      .select(col(pkCol).as("query_id"), col(embCol).as("qe"))
      .withColumn("qnorm", sqrt(dot(col("qe"), col("qe"))))
    val probeCells = probes.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qe"),
        col("cent_id").as(CellCol),
        (dot(col("qe"), col("cent_e")) / (col("qnorm") * col("cent_norm")))
          .as("_cs"))
      .withColumn("_rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("_cs").desc, col(CellCol))))
      .filter(col("_rnk") <= nprobe)
      .select(col("query_id"), packed(col("qe")).as("qbits"),
        col(CellCol).cast("long").as(CellCol))
    // literal cell list → directory-level partition pruning on the scan
    val cells = probeCells.select(col(CellCol)).distinct()
      .collect().map(_.getLong(0)).toSeq
    val scan0 = store.read(codesName(table))
      .filter(col(CellCol).isin(cells: _*))
      .withColumn(CellCol, col(CellCol).cast("long"))
      .select(col("pk").as("cand_id"), col(CellCol), col("bits"))
    val scan = allowed.fold(scan0)(
      AnnFilter.semiJoinAllowed(scan0, _, "cand_id"))
    scan
      .join(broadcast(probeCells), Seq(CellCol))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        ham(col("bits"), col("qbits")).cast("long").as("hamming"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("hamming"), col("cand_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("hamming"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Two-stage serving search: cell-pruned Hamming shortlist of
    * `depth`, exact cosine re-rank over the shortlist's
    * full-precision base rows (broadcast semi-join — the floats are
    * never shuffled corpus-wide). Returns (query_id, rnk, cand_id,
    * cos).
    */
  def rerank(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, depth: Int,
      nprobe: Int = 2): DataFrame = {
    val shortlist =
      annTopK(store, table, queries, pkCol, embCol, depth, nprobe)
        .select(col("query_id"), col("cand_id"))
    // the exact stage is the FLAT binary family's, shared verbatim —
    // self-exclusion came from annTopK above, the stage doesn't care
    Bin.exactRerank(store, table, queries, shortlist, pkCol, embCol, k)
  }
}
