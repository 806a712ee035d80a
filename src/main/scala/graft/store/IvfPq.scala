package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Combined IVF+PQ persisted index — the production vector-store
  * layout (the FAISS IVFPQ design re-expressed as Spark plans over
  * the [[TableStore]]): [[Ivf]]-style cells bound WHICH code rows a
  * probe reads (Hive partition pruning on `cell=N` directories — an
  * nprobe-of-k search reads nprobe/k of the code table before any row
  * deserializes), and [[Pq]]-style codes bound the BYTES read per
  * candidate (`slices` small ints instead of `dims` floats). ADC
  * scores candidates against per-(query, probed-cell) lookup tables;
  * raw candidate vectors are never read at search time.
  *
  * Codes are RESIDUAL codes: a vector stores the quantization of
  * r = e − centroid[cell]. Residuals are centered near the origin
  * whatever cell they came from, so one shared codebook set covers
  * every cell (FAISS's encode-by-residual), and the probe-side LUT is
  * built per probed cell against the QUERY's residual in that cell —
  * the asymmetric-distance shape that keeps accuracy at a 32×
  * compression.
  *
  * Tables on the store:
  *  - `<t>_ivfpq_cents` (cent_id, cent_e, cent_norm): coarse
  *    centroids from [[Kmeans.train]];
  *  - `<t>_ivfpq_books` (s, cent_id, ce): residual codebooks from
  *    [[Pq.trainBooks]] (all subspaces trained in one joint loop);
  *  - `<t>_ivfpq` (pk, codes, cell=N): the code rows, partitioned by
  *    cell, maintained through [[CellIndex.maintain]] — a batch
  *    rewrites only the cells it touches, O(batch) not O(index);
  *  - `<t>_ivfpq_map` (pk, cell): the pk → cell lookup that makes
  *    cross-cell moves O(batch).
  *
  * Determinism mirrors the oracle-checked inline query
  * (queries/SimilarityOps.annIvfPqTopK): max-cosine cell assignment
  * tie-broken to the lower cent_id, argmin codes tie-broken to the
  * lower code, LUT distances 1e-6-quantized to longs so candidate
  * sums are exact on any partitioning.
  */
object IvfPq {

  def codesName(table: String): String = s"${table}_ivfpq"
  def centsName(table: String): String = s"${table}_ivfpq_cents"
  def booksName(table: String): String = s"${table}_ivfpq_books"
  def mapName(table: String): String = s"${table}_ivfpq_map"

  private def dot(a: Column, b: Column): Column =
    graft.functions.SliceDists.dotFold(
      org.apache.spark.sql.SparkSession.active, a, b)

  private def sub(a: Column, b: Column): Column =
    graft.functions.SliceDists.subVec(
      org.apache.spark.sql.SparkSession.active, a, b)

  /** Nearest-cell assignment + residual: (pk, cell, r). Broadcast
    * centroids, max_by partial agg — one row per vector crosses the
    * exchange, the assigned centroid rides along only to form the
    * residual.
    */
  private def assignResiduals(
      batch: DataFrame, cents: DataFrame,
      pkCol: String, embCol: String): DataFrame =
    batch.select(col(pkCol).as("pk"), col(embCol).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
      .crossJoin(broadcast(cents))
      .select(col("pk"), col("e"), col("cent_id"), col("cent_e"),
        (dot(col("e"), col("cent_e")) / (col("norm") * col("cent_norm")))
          .as("_cs"))
      .groupBy(col("pk"))
      .agg(max_by(struct(col("e"), col("cent_id").as("cell"), col("cent_e")),
        struct(col("_cs"), (-col("cent_id")).as("_nc"))).as("_best"))
      .select(col("pk"), col("_best.cell").as("cell"),
        sub(col("_best.e"), col("_best.cent_e")).as("r"))

  /** Train coarse centroids on the corpus, train residual codebooks
    * against them, persist both, and index the batch.
    */
  def buildIndex(
      store: TableStore, table: String, emb: DataFrame,
      pkCol: String, embCol: String,
      kCells: Int = 16, slices: Int = 8, subDim: Int = 8,
      kCodes: Int = 16, iters: Int = 3): Unit = {
    val cents = Kmeans.train(
      emb.select(col(pkCol).as("vec_id"), col(embCol).as("e")), kCells, iters)
      .withColumn("cent_norm", sqrt(dot(col("cent_e"), col("cent_e"))))
    store.overwrite(centsName(table), cents)
    val resid = Iteration.materialize(
      assignResiduals(emb, cents, pkCol, embCol))
    val books = Pq.trainBooks(resid, "pk", "r", slices, subDim, kCodes, iters)
    store.overwrite(booksName(table), books)
    // encode the residuals already materialized for training — calling
    // upsertWithCodes here would redo the full-corpus assignment pass
    indexResiduals(store, table, resid, books, slices, subDim)
    store.upsert(table, emb, Seq(pkCol))
    IvfDrift.snapshot(store, centsName(table), mapName(table))
    IvfDrift.recordTraining(store, s"${table}_ivfpq", Map(
      "table" -> table, "family" -> "ivfpq", "pk" -> pkCol, "emb" -> embCol,
      "kCells" -> kCells.toString, "slices" -> slices.toString,
      "subDim" -> subDim.toString, "kCodes" -> kCodes.toString,
      "iters" -> iters.toString))
  }

  /** Encode a (pk, cell, r) residual frame against `books` and merge
    * the codes into the cell-partitioned index + map.
    */
  private def indexResiduals(
      store: TableStore, table: String, resid: DataFrame, books: DataFrame,
      slices: Int, subDim: Int): Unit = {
    val fresh = Iteration.materialize(
      Pq.encode(resid, books, "pk", "r", slices, subDim)
        .join(resid.select(col("pk"), col("cell")), Seq("pk")))
    CellIndex.maintain(store, codesName(table), mapName(table), fresh)
  }

  /** Upsert embedding rows AND their cell-partitioned residual codes:
    * the batch assigns and encodes against the persisted centroids
    * and books (O(batch) — the corpus is never re-encoded), and only
    * touched cells rewrite. Requires `buildIndex` (or manual cents +
    * books writes) first.
    */
  def upsertWithCodes(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String,
      slices: Int = 8, subDim: Int = 8): Unit = {
    refreshCodes(store, table, batch, pkCol, embCol, slices, subDim)
    store.upsert(table, batch, Seq(pkCol))
  }

  /** The residual-codes half of [[upsertWithCodes]] — no base write
    * (the SQL DML maintenance seam, [[IndexMaintain]]).
    */
  private[store] def refreshCodes(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String,
      slices: Int = 8, subDim: Int = 8): Unit = {
    val cents = store.read(centsName(table))
    val books = store.read(booksName(table))
    val resid = Iteration.materialize(
      assignResiduals(batch, cents, pkCol, embCol))
    indexResiduals(store, table, resid, books, slices, subDim)
  }

  /** ANN top-k over the persisted index: probes pick their `nprobe`
    * max-cosine cells (broadcast centroids), the code scan PRUNES to
    * those cell directories, and ADC sums per-(query, cell) LUT
    * entries selected by each candidate's codes — an equi-join on
    * (cell, s, code) followed by one partial-agg'd sum and a
    * WindowGroupLimit top-k. Returns (query_id, rnk, cand_id, adist).
    */
  def annTopK(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, nprobe: Int = 2,
      slices: Int = 8, subDim: Int = 8): DataFrame =
    annSearch(store, table, queries, pkCol, embCol, k, nprobe,
      slices, subDim, allowed = None)

  /** Filtered cell-pruned ADC top-k: the allowed set semi-joins the
    * cell-pruned code scan before the ADC fold. Same filter × probe
    * interplay as [[IvfSq.annTopKFiltered]] — allowed rows in
    * unprobed cells are invisible, so the filtered default probes 2×
    * wider; at extreme selectivity brute-force the allowed rows
    * instead of the index.
    */
  def annTopKFiltered(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, allowed: DataFrame,
      nprobe: Int = 4, slices: Int = 8, subDim: Int = 8): DataFrame =
    annSearch(store, table, queries, pkCol, embCol, k, nprobe,
      slices, subDim, Some(allowed))

  private def annSearch(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, nprobe: Int,
      slices: Int, subDim: Int, allowed: Option[DataFrame]): DataFrame = {
    val cents = store.read(centsName(table))
    val books = store.read(booksName(table))
    val probeCells = queries
      .select(col(pkCol).as("query_id"), col(embCol).as("qe"))
      .withColumn("qnorm", sqrt(dot(col("qe"), col("qe"))))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("cent_id").as("cell"),
        (dot(col("qe"), col("cent_e")) / (col("qnorm") * col("cent_norm")))
          .as("_cs"),
        sub(col("qe"), col("cent_e")).as("qr"))
      .withColumn("_rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("_cs").desc, col("cell"))))
      .filter(col("_rnk") <= nprobe)
      .select(col("query_id"), col("cell").cast("long").as("cell"), col("qr"))
    // literal cell list → directory-level partition pruning on the scan
    val cells = probeCells.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq
    // per-(query, cell) residual LUT: nprobe × slices × kCodes rows
    // per probe — tiny, broadcast
    val lut = Pq.subvectors(
        probeCells.select(
          struct(col("query_id"), col("cell")).as("qk"), col("qr")),
        "qk", "qr", slices, subDim)
      .join(broadcast(books), Seq("s"))
      .select(col("pk.query_id").as("query_id"), col("pk.cell").as("cell"),
        col("s"), col("cent_id").as("code"),
        floor(Pq.l2sq(col("sv"), col("ce")) * 1e6).cast("long").as("qd"))
    // one (query_id, cell, lut_arr) row per probe: qd sorted by
    // (s, code) is the s·k + code row-major order AdcDist indexes —
    // each candidate then scores as ONE native fold of its code blob
    // (map-only; no per-slice blowup, no (query, cand) aggregate
    // exchange; same quantized longs, so distances are bit-identical
    // to the former join/groupBy form)
    val lutArr = lut.groupBy(col("query_id"), col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("s"), col("code"), col("qd")))),
        x => x.getField("qd")).as("lut_arr"))
    val spark = org.apache.spark.sql.SparkSession.active
    val scan0 = store.read(codesName(table))
      .filter(col("cell").isin(cells: _*))
      .withColumn("cell", col("cell").cast("long"))
      .select(col("pk").as("cand_id"), col("cell"), col("codes"))
    val scan = allowed.fold(scan0)(
      AnnFilter.semiJoinAllowed(scan0, _, "cand_id"))
    scan
      .join(broadcast(lutArr), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        graft.functions.SliceDists.adcDist(spark, col("codes"), col("lut_arr"))
          .as("adist"))
      .filter(col("adist").isNotNull)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adist"), col("cand_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("adist"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
