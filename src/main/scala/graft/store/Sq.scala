package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) as a maintained store component — the
  * per-DIMENSION sibling of [[Pq]] (per-SUBSPACE codebooks) and the
  * persisted form of the q_int8_quant operator: each dimension gets an
  * affine [min, max] → [0, 255] scale trained once over the corpus,
  * and a vector is stored as its per-dim int8 codes + its dequantized
  * norm — 4× smaller than float32, no codebook training loop, and
  * (unlike PQ) a bounded, per-dim reconstruction error. The
  * FAISS-ScalarQuantizer recipe, Spark-shaped.
  *
  * Two tables ride the [[TableStore]]:
  *  - `<table>_sq_scales` (pos, mn, mx): the per-dimension affine
  *    scales, written once at training time (dims rows);
  *  - `<table>_sq` (pk, codes, dnorm): one row per vector — codes as
  *    a BinaryType blob, one unsigned byte per dimension in position
  *    order (the FAISS uint8 layout: 1 B/dim in Tungsten rows and on
  *    disk, the genuine 4× vs float32), plus the norm of the
  *    DEQUANTIZED vector, stored at encode time so search never
  *    recomputes it. Maintained with the same upsert-batch pattern as
  *    the PQ codes: re-upserted vectors re-encode O(batch), never
  *    O(corpus).
  *
  * Search is ASYMMETRIC (full-precision query vs dequantized
  * candidate), the standard SQ trade: with sc_d = (mx_d − mn_d)/255,
  *
  *   q · dequant(c) = Σ_d q_d·mn_d  +  Σ_d (q_d·sc_d)·code_d
  *
  * so the scan side reads ONLY the code rows — the first term and the
  * per-dim weights (q_d·sc_d) are per-query constants. Per-dim
  * products quantize to 1e-6 longs before the sum (the [[Pq]] LUT
  * convention), so candidate scores are exact and commutative on any
  * partitioning.
  *
  * Quantization convention matches q_int8_quant exactly: round-half-up
  * spelled floor(v + 0.5), a constant dimension (mx = mn) codes to 0.
  */
object Sq {

  def codesName(table: String): String = s"${table}_sq"
  def scalesName(table: String): String = s"${table}_sq_scales"

  private def dot(a: Column, b: Column): Column =
    graft.functions.SliceDists.dotFold(
      org.apache.spark.sql.SparkSession.active, a, b)

  private def pack(c: Column): Column =
    graft.functions.SliceDists.packCodes(
      org.apache.spark.sql.SparkSession.active, c)

  /** Per-dimension (pos, mn, mx) scales over the corpus — a dims-group
    * partial aggregation (one tiny shuffle regardless of corpus size).
    * `pos` is 1-based.
    */
  def trainScales(emb: DataFrame, embCol: String): DataFrame =
    emb.select(posexplode(col(embCol)).as(Seq("p", "x")))
      .select((col("p") + 1).as("pos"), col("x"))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** (pk, codes, dnorm) rows: per-dim affine codes against the scales
    * (broadcast — dims rows), plus the dequantized-vector norm. The
    * norm's squared sum quantizes to 1e-6 longs first, so the stored
    * value is identical on any partitioning.
    */
  def encode(
      emb: DataFrame, scales: DataFrame, pkCol: String, embCol: String): DataFrame =
    emb.select(col(pkCol).as("pk"), posexplode(col(embCol)).as(Seq("p", "x")))
      .select(col("pk"), (col("p") + 1).as("pos"), col("x"))
      .join(broadcast(scales), Seq("pos"))
      .select(col("pk"), col("pos"),
        when(col("mx") === col("mn"), lit(0))
          .otherwise(floor(
            (col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn"))
              + lit(0.5)).cast("int")).as("code"),
        col("mn"), col("mx"))
      .withColumn("dq",
        col("mn") + col("code").cast("double") * (col("mx") - col("mn"))
          / lit(255.0))
      .groupBy(col("pk"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("code")))),
          x => x.getField("code")).as("codes"),
        sqrt(sum(floor(col("dq") * col("dq") * lit(1e6)).cast("long"))
          .cast("double") / lit(1e6)).as("dnorm"))
      // persisted layout is the FAISS uint8 blob: 1 byte per dim in
      // Tungsten rows and on disk, the real 4×-vs-float32 density
      .select(col("pk"), pack(col("codes")).as("codes"), col("dnorm"))

  /** Train-and-persist: write `<table>_sq_scales` from the batch
    * corpus and seed `<table>_sq` with the batch's codes.
    */
  def buildIndex(
      store: TableStore, table: String, emb: DataFrame,
      pkCol: String, embCol: String): Unit = {
    store.overwrite(scalesName(table), trainScales(emb, embCol))
    upsertWithCodes(store, table, emb, pkCol, embCol)
  }

  /** Upsert embedding rows AND their SQ codes: the batch encodes
    * against the persisted scales (O(batch) — the corpus is never
    * re-encoded) and upserts into `<table>_sq` keyed by pk, then the
    * base table upserts as usual. Requires [[buildIndex]] first.
    */
  def upsertWithCodes(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String): Unit = {
    refreshCodes(store, table, batch, pkCol, embCol)
    store.upsert(table, batch, Seq(pkCol))
  }

  /** The codes half of [[upsertWithCodes]] — no base write (the SQL
    * DML maintenance seam, [[IndexMaintain]]). Records provenance so
    * later maintenance needs nothing restated.
    */
  private[store] def refreshCodes(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String): Unit = {
    IndexMaintain.recordIfChanged(store, codesName(table), Map(
      "table" -> table, "family" -> "sq", "pk" -> pkCol, "emb" -> embCol))
    val scales = store.read(scalesName(table))
    store.upsert(codesName(table),
      encode(batch, scales, pkCol, embCol), Seq("pk"))
  }

  /** Asymmetric cosine top-k over the PERSISTED code table: per query,
    * one broadcast row carries the position-ordered weight array
    * (q_d·sc_d), the constant term Σ q_d·mn_d, and the query norm; the
    * scan side reads ONLY stored code rows (4× fewer bytes than the
    * raw vectors) and scores each candidate with ONE native
    * [[graft.functions.CodeDotQ]] fold — a map-only pass, no per-dim
    * row blowup, no aggregate exchange on (query, cand); the only
    * shuffle left is the WindowGroupLimit top-k's. Scores are
    * bit-identical to the former posexplode/groupBy form (same
    * floor(w·code·1e6) longs, long addition commutes). Ties break on
    * the lower candidate pk.
    */
  def annTopK(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int): DataFrame =
    annSearch(store, table, queries, pkCol, embCol, k, allowed = None)

  /** Filtered search: top-k among candidates whose pk appears in
    * `allowed` (one column, candidate pks) — the PRE-filter design:
    * the predicate semi-joins the code scan BEFORE the scoring fold,
    * so cost is selectivity-proportional and the search returns k
    * results whenever k matches exist. (Post-filtering [[annTopK]]'s
    * fixed-depth output returns FEWER than k whenever the predicate
    * is rarer than 1/depth — the classic filtered-ANN failure.)
    * Scales and codes are untouched: the quantization is an index
    * property, never a function of the predicate.
    */
  def annTopKFiltered(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, allowed: DataFrame): DataFrame =
    annSearch(store, table, queries, pkCol, embCol, k, Some(allowed))

  private def annSearch(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int,
      allowed: Option[DataFrame]): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    val scales = store.read(scalesName(table))
    // per-query broadcast row: pos-ordered weight array + constants
    val qarr = queries
      .select(col(pkCol).as("query_id"), col(embCol).as("qe"))
      .withColumn("qnorm", sqrt(dot(col("qe"), col("qe"))))
      .select(col("query_id"), col("qnorm"),
        posexplode(col("qe")).as(Seq("p", "qx")))
      .select(col("query_id"), col("qnorm"), (col("p") + 1).as("pos"), col("qx"))
      .join(broadcast(scales), Seq("pos"))
      .select(col("query_id"), col("qnorm"), col("pos"),
        (col("qx") * (col("mx") - col("mn")) / lit(255.0)).as("w"),
        (col("qx") * col("mn")).as("qmnTerm"))
      .groupBy(col("query_id"), col("qnorm"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")).as("warr"),
        sum(floor(col("qmnTerm") * lit(1e6)).cast("long")).as("qmnQ"))
    val codes0 = store.read(codesName(table))
      .select(col("pk").as("cand_id"), col("dnorm"), col("codes"))
    val codes = allowed.fold(codes0)(
      AnnFilter.semiJoinAllowed(codes0, _, "cand_id"))
    codes
      .crossJoin(broadcast(qarr))
      .select(col("query_id"), col("cand_id"),
        (((graft.functions.SliceDists.codeDotQ(spark, col("codes"), col("warr"))
          + col("qmnQ")).cast("double") / lit(1e6))
          / (col("qnorm") * col("dnorm"))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("cand_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("cos"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
