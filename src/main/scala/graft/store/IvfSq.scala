package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF + SQ8 — the scalar-quantized member of the composed-index
  * family (FAISS's IVFScalarQuantizer): [[Ivf]] cells cut WHICH
  * candidates are read (directory-level partition pruning), per-dim
  * int8 codes of the RESIDUAL e − centroid[cell] cut the bytes per
  * candidate 4×. Where [[IvfPq]] trades fidelity for 32×, this rung
  * keeps SQ's provable half-step error bound per dimension — the
  * higher-recall / lower-compression point on the same ladder, with
  * no codebook training loop (scales are one aggregation).
  *
  * Residuals center near the origin whatever cell they came from
  * (the same argument as IvfPq's encode-by-residual), so ONE global
  * per-dim scale set covers all cells. Four tables ride the
  * [[TableStore]]:
  *  - `<t>_ivfsq_cents` (cent_id, cent_e, cent_norm): trained coarse
  *    centroids (broadcast at assignment and probe time);
  *  - `<t>_ivfsq_scales` (pos, mn, mx): per-dim residual scales;
  *  - `<t>_ivfsq` (pk, codes, rnorm, cell=N/): the code rows,
  *    Hive-partitioned by cell — `rnorm` is the norm of the
  *    RECONSTRUCTED vector centroid + dequant(residual), stored at
  *    encode time so search reads nothing else;
  *  - `<t>_ivfsq_map` (pk, cell): the O(batch) re-assignment lookup.
  *
  * Search scores cos(q, cand) against the reconstruction:
  *   q · (cent + dq_r) = q·cent  +  Σ_d q_d·mn_d  +  Σ_d (q_d·sc_d)·code_d
  * — the first term is per-(query, probed cell), the second and the
  * per-dim weights are per-query constants, and every term
  * 1e-6-quantizes to longs before summing (exact, commutative on any
  * partitioning — the [[Pq]] LUT convention). Maintenance is shared
  * through [[CellIndex]]: only touched cells rewrite.
  */
object IvfSq {

  def codesName(table: String): String = s"${table}_ivfsq"
  def centsName(table: String): String = s"${table}_ivfsq_cents"
  def scalesName(table: String): String = s"${table}_ivfsq_scales"
  def mapName(table: String): String = s"${table}_ivfsq_map"

  private val CellCol = "cell"

  private def dot(a: Column, b: Column): Column =
    graft.functions.SliceDists.dotFold(
      org.apache.spark.sql.SparkSession.active, a, b)

  private def sub(a: Column, b: Column): Column =
    graft.functions.SliceDists.subVec(
      org.apache.spark.sql.SparkSession.active, a, b)

  private def pack(c: Column): Column =
    graft.functions.SliceDists.packCodes(
      org.apache.spark.sql.SparkSession.active, c)

  /** Nearest-cell assignment + residual: (pk, cell, r). Broadcast
    * centroids, max_by partial agg, ties to the lower cent_id — the
    * [[IvfPq]] discipline.
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
      .agg(max_by(struct(col("e"), col("cent_id").as(CellCol), col("cent_e")),
        struct(col("_cs"), (-col("cent_id")).as("_nc"))).as("_best"))
      .select(col("pk"), col(s"_best.$CellCol").as(CellCol),
        col("_best.cent_e").as("cent_e"),
        sub(col("_best.e"), col("_best.cent_e")).as("r"))

  /** (pk, cell, codes, rnorm) rows: residuals coded per-dim against
    * the scales (q_int8_quant floor(v + 0.5) convention), `rnorm` the
    * norm of centroid + dequant(residual) with squares 1e-6-quantized
    * before the sum.
    */
  private def encode(resid: DataFrame, scales: DataFrame): DataFrame =
    resid
      .select(col("pk"), col(CellCol),
        posexplode(arrays_zip(col("r"), col("cent_e"))).as(Seq("p", "z")))
      .select(col("pk"), col(CellCol), (col("p") + 1).as("pos"),
        col("z.r").as("x"), col("z.cent_e").as("ce"))
      .join(broadcast(scales), Seq("pos"))
      .select(col("pk"), col(CellCol), col("pos"), col("ce"),
        when(col("mx") === col("mn"), lit(0))
          .otherwise(floor(
            (col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn"))
              + lit(0.5)).cast("int")).as("code"),
        col("mn"), col("mx"))
      .withColumn("recon",
        col("ce") + col("mn") + col("code").cast("double")
          * (col("mx") - col("mn")) / lit(255.0))
      .groupBy(col("pk"), col(CellCol))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("code")))),
          x => x.getField("code")).as("codes"),
        sqrt(sum(floor(col("recon") * col("recon") * lit(1e6)).cast("long"))
          .cast("double") / lit(1e6)).as("rnorm"))
      // persisted layout is the FAISS uint8 blob (see Sq.encode)
      .select(col("pk"), col(CellCol),
        pack(col("codes")).as("codes"), col("rnorm"))

  /** Train coarse centroids and residual scales on the corpus,
    * persist both, and index the batch.
    */
  def buildIndex(
      store: TableStore, table: String, emb: DataFrame,
      pkCol: String, embCol: String,
      kCells: Int = 16, iters: Int = 3): Unit = {
    val cents = Kmeans.train(
      emb.select(col(pkCol).as("vec_id"), col(embCol).as("e")), kCells, iters)
      .withColumn("cent_norm", sqrt(dot(col("cent_e"), col("cent_e"))))
    store.overwrite(centsName(table), cents)
    val resid = Iteration.materialize(
      assignResiduals(emb, store.read(centsName(table)), pkCol, embCol))
    store.overwrite(scalesName(table),
      resid.select(posexplode(col("r")).as(Seq("p", "x")))
        .select((col("p") + 1).as("pos"), col("x"))
        .groupBy(col("pos"))
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx")))
    upsertWithCodes(store, table, emb, pkCol, embCol)
    IvfDrift.snapshot(store, centsName(table), mapName(table))
    IvfDrift.recordTraining(store, s"${table}_ivfsq", Map(
      "table" -> table, "family" -> "ivfsq", "pk" -> pkCol, "emb" -> embCol,
      "kCells" -> kCells.toString, "iters" -> iters.toString))
  }

  /** Upsert embedding rows AND their cell-partitioned codes: assign
    * and encode against the PERSISTED centroids/scales (O(batch) — a
    * stream never retrains either), then [[CellIndex]] rewrites only
    * the touched cells.
    */
  def upsertWithCodes(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String): Unit = {
    refreshCodes(store, table, batch, pkCol, embCol)
    store.upsert(table, batch, Seq(pkCol))
  }

  /** The residual-codes half of [[upsertWithCodes]] — no base write
    * (the SQL DML maintenance seam, [[IndexMaintain]]).
    */
  private[store] def refreshCodes(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String): Unit = {
    val resid = assignResiduals(
      batch, store.read(centsName(table)), pkCol, embCol)
    val fresh = Iteration.materialize(
      encode(resid, store.read(scalesName(table))))
    CellIndex.maintain(store, codesName(table), mapName(table), fresh)
  }

  /** ANN top-k: queries probe their nprobe nearest cells (broadcast
    * centroids), the code scan directory-prunes to those cells, and
    * candidates score through their codes alone —
    * q·cent per (query, cell), Σ q_d·mn_d and the per-dim weights per
    * query, all 1e-6-quantized. Returns (query_id, rnk, cand_id, cos).
    */
  def annTopK(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, nprobe: Int = 2): DataFrame =
    annSearch(store, table, queries, pkCol, embCol, k, nprobe, allowed = None)

  /** Filtered search through the composed index: top-k among
    * candidates whose pk appears in `allowed`, pre-filtered — the
    * predicate semi-joins the CELL-PRUNED code scan before scoring,
    * so cost stays (probed cells ∩ allowed)-proportional. The
    * filter × probe interplay is the part flat [[Sq.annTopKFiltered]]
    * doesn't have: allowed rows living in UNPROBED cells are
    * invisible, and the more selective the predicate, the fewer of
    * the probed cells' rows survive it — so filtered searches should
    * probe WIDER than unfiltered ones (the FAISS selectivity rule of
    * thumb). `nprobe` therefore defaults to 2× the unfiltered
    * default here; at extreme selectivity (|allowed| ≈ k) skip the
    * index and brute-force the allowed rows' vectors instead.
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
    val scales = store.read(scalesName(table))
    val probes = queries
      .select(col(pkCol).as("query_id"), col(embCol).as("qe"))
      .withColumn("qnorm", sqrt(dot(col("qe"), col("qe"))))
    val probeCells = probes.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qe"), col("qnorm"),
        col("cent_id").as(CellCol),
        floor(dot(col("qe"), col("cent_e")) * lit(1e6)).cast("long")
          .as("qcentq"),
        (dot(col("qe"), col("cent_e")) / (col("qnorm") * col("cent_norm")))
          .as("_cs"))
      .withColumn("_rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("_cs").desc, col(CellCol))))
      .filter(col("_rnk") <= nprobe)
      .select(col("query_id"), col("qe"), col("qnorm"),
        col(CellCol).cast("long").as(CellCol), col("qcentq"))
    // per-query broadcast row: pos-ordered weight array + Σ q_d·mn_d —
    // one native CodeDotQ fold scores a candidate from its code row
    // alone (map-only; no per-dim blowup, no (query, cand) aggregate
    // exchange — same floor(w·code·1e6) longs as the former groupBy
    // form, so scores are bit-identical)
    val qarr = probes
      .select(col("query_id"), posexplode(col("qe")).as(Seq("p", "qx")))
      .select(col("query_id"), (col("p") + 1).as("pos"), col("qx"))
      .join(broadcast(scales), Seq("pos"))
      .select(col("query_id"), col("pos"),
        (col("qx") * (col("mx") - col("mn")) / lit(255.0)).as("w"),
        (col("qx") * col("mn")).as("qmn"))
      .groupBy(col("query_id"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")).as("warr"),
        sum(floor(col("qmn") * lit(1e6)).cast("long")).as("qmnq"))
    // literal cell list → directory-level partition pruning on the scan
    val cells = probeCells.select(col(CellCol)).distinct()
      .collect().map(_.getLong(0)).toSeq
    val spark = org.apache.spark.sql.SparkSession.active
    val scan0 = store.read(codesName(table))
      .filter(col(CellCol).isin(cells: _*))
      .withColumn(CellCol, col(CellCol).cast("long"))
      .select(col("pk").as("cand_id"), col(CellCol), col("rnorm"), col("codes"))
    val scan = allowed.fold(scan0)(
      AnnFilter.semiJoinAllowed(scan0, _, "cand_id"))
    scan
      .join(broadcast(probeCells
        .select(col("query_id"), col(CellCol), col("qcentq"), col("qnorm"))),
        Seq(CellCol))
      .filter(col("cand_id") =!= col("query_id"))
      .join(broadcast(qarr), Seq("query_id"))
      .select(col("query_id"), col("cand_id"),
        (((graft.functions.SliceDists.codeDotQ(spark, col("codes"), col("warr"))
          + col("qmnq") + col("qcentq")).cast("double") / lit(1e6))
          / (col("qnorm") * col("rnorm"))).as("cosine"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("cand_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
