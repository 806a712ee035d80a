package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary sign-bit quantization as a maintained store component — the
  * 1-bit/dim rung under [[Sq]] (8 bits/dim) and [[Pq]] (sub-byte via
  * codebooks), the FAISS `IndexBinaryFlat` recipe: a vector collapses
  * to its per-dim sign bits (bit d set iff x_d > 0, the
  * [[graft.functions.SignPack]] layout) and candidates rank by
  * popcount-of-XOR Hamming distance — 32× smaller than float32 and
  * the scoring is INTEGER-only, the cheapest possible corpus-wide
  * scan for a serving shortlist. Unlike [[Sq]]/[[Pq]] there is no
  * training step at all: encode is stateless per-row, so the index
  * never goes stale against a drifted corpus and a cold build is one
  * map-only pass.
  *
  * One table rides the [[TableStore]]: `<table>_bin` (pk, bits) — one
  * row per vector, bits a ceil(dims/8)-byte blob. Maintained with the
  * same upsert-batch pattern as the SQ/PQ code tables: re-upserted
  * vectors re-encode O(batch), never O(corpus).
  *
  * Search is SYMMETRIC (query packs through the same SignPack) and
  * exact over the codes: Hamming distances are small integers, so
  * scores are trivially identical on any partitioning — no
  * quantized-long discipline needed. Sign bits preserve angular
  * locality on zero-centered dims (Charikar's hyperplane LSH with the
  * standard basis as planes), so the production composition is
  * [[rerank]]: Hamming shortlist over the blobs (map-only integer
  * scan), exact cosine over |queries|·depth full-precision rows
  * fetched through a broadcast semi-join — never a second full scan.
  *
  * The inline oracle forms live in
  * graft.queries.SimilarityOps (q_ann_hamming_topk /
  * q_ann_hamming_rerank); reference scope: the reference engine
  * (twitter-to-sqlite) has no vector surface — this extends the
  * BASELINE.json similarity-search north star.
  */
object Bin {

  def codesName(table: String): String = s"${table}_bin"

  private def spark = org.apache.spark.sql.SparkSession.active

  private def dot(a: Column, b: Column): Column =
    graft.functions.SliceDists.dotFold(spark, a, b)

  private def packed(c: Column): Column =
    graft.functions.SliceDists.signPack(spark, c.cast("array<double>"))

  private def ham(a: Column, b: Column): Column =
    graft.functions.SliceDists.hammingFold(spark, a, b)

  /** Plans built here can mix store-session frames with caller
    * frames from ANOTHER session (foreachBatch's isolated clone —
    * the StreamBinDup lesson); unresolved function nodes resolve
    * against the ROOT frame's session, so make sure the store's
    * registry has every kernel regardless of which session is
    * `active` at column-construction time.
    */
  private def registerOn(s: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.GraftFunctions.registerAll(s)

  /** (pk, bits) rows — stateless map-only encode, no scales/codebook
    * to train or broadcast.
    */
  def encode(emb: DataFrame, pkCol: String, embCol: String): DataFrame =
    emb.select(col(pkCol).as("pk"), packed(col(embCol)).as("bits"))

  /** Cold build: seed `<table>_bin` with the batch's sign blobs and
    * land the base rows.
    */
  def buildIndex(
      store: TableStore, table: String, emb: DataFrame,
      pkCol: String, embCol: String): Unit =
    upsertWithCodes(store, table, emb, pkCol, embCol)

  /** Upsert embedding rows AND their sign blobs: O(batch) — with no
    * trained state there is nothing else to touch.
    */
  def upsertWithCodes(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String): Unit = {
    refreshCodes(store, table, batch, pkCol, embCol)
    store.upsert(table, batch, Seq(pkCol))
  }

  /** The blobs half of [[upsertWithCodes]] — no base write (the SQL
    * DML maintenance seam, [[IndexMaintain]]); records provenance.
    */
  private[store] def refreshCodes(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String): Unit = {
    registerOn(store.spark)
    IndexMaintain.recordIfChanged(store, codesName(table), Map(
      "table" -> table, "family" -> "bin", "pk" -> pkCol, "emb" -> embCol))
    store.upsert(codesName(table), encode(batch, pkCol, embCol), Seq("pk"))
  }

  /** Hamming top-k over the PERSISTED blob table: queries pack
    * map-side and broadcast; the scan side reads ONLY `<table>_bin`
    * (32× fewer bytes than the raw vectors) and scores each candidate
    * with one native [[graft.functions.HammingFold]] popcount — the
    * only shuffle is the WindowGroupLimit top-k's. Ties break on the
    * lower candidate pk. A query pk that also lives in the corpus is
    * NOT excluded (its distance is 0) — callers filter if they mean
    * "neighbors other than me", same contract as the Sq/Pq paths.
    */
  def annTopK(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int): DataFrame =
    annSearch(store, table, queries, pkCol, embCol, k, allowed = None)

  /** Filtered Hamming top-k: candidates restricted to the pks in
    * `allowed` (one column) — the PRE-filter design shared with
    * [[Sq.annTopKFiltered]]: the predicate semi-joins the blob scan
    * before the popcount, so cost is selectivity-proportional and k
    * results return whenever k matches exist. The stateless encode
    * means no scales/codebook can depend on the predicate by
    * construction.
    */
  def annTopKFiltered(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, allowed: DataFrame): DataFrame =
    annSearch(store, table, queries, pkCol, embCol, k, Some(allowed))

  /** Filtered two-stage search: the Hamming SHORTLIST itself is
    * restricted to `allowed`, then exact-rerank — so the depth budget
    * is spent entirely on predicate-matching candidates instead of
    * being crowded out by non-matching near neighbors (the
    * post-filter starvation the pre-filter family exists to avoid).
    */
  def rerankFiltered(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, depth: Int,
      allowed: DataFrame): DataFrame = {
    val shortlist = annTopKFiltered(
        store, table, queries, pkCol, embCol, depth, allowed)
      .select(col("query_id"), col("cand_id"))
    exactRerank(store, table, queries, shortlist, pkCol, embCol, k)
  }

  private def annSearch(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int,
      allowed: Option[DataFrame]): DataFrame = {
    registerOn(store.spark)
    val q = queries.select(
      col(pkCol).as("query_id"), packed(col(embCol)).as("qbits"))
    val scan0 = store.read(codesName(table))
      .select(col("pk").as("cand_id"), col("bits"))
    val scan = allowed.fold(scan0)(
      AnnFilter.semiJoinAllowed(scan0, _, "cand_id"))
    scan
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("cand_id"),
        ham(col("bits"), col("qbits")).cast("long").as("hamming"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("hamming"), col("cand_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("hamming"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Two-stage serving search: Hamming shortlist of `depth` over the
    * blobs, exact cosine re-rank of the shortlist's full-precision
    * rows (read from the base table through a BROADCAST of the tiny
    * shortlist — the float vectors are never shuffled corpus-wide).
    * Returns (query_id, rnk, cand_id, cos), top-`k` by exact cosine.
    */
  def rerank(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, depth: Int): DataFrame = {
    val shortlist = annTopK(store, table, queries, pkCol, embCol, depth)
      .select(col("query_id"), col("cand_id"))
    exactRerank(store, table, queries, shortlist, pkCol, embCol, k)
  }

  /** Exact-cosine re-rank of a (query_id, cand_id) shortlist — the
    * shared stage-2 of the binary family ([[rerank]] here and
    * [[IvfBin.rerank]]): the tiny shortlist broadcasts INTO the
    * base-table scan, full-precision vectors are read only for
    * shortlisted rows and never shuffled corpus-wide. Whether self
    * matches appear is the SHORTLIST's semantics, not this stage's.
    */
  private[store] def exactRerank(
      store: TableStore, table: String, queries: DataFrame,
      shortlist: DataFrame, pkCol: String, embCol: String,
      k: Int): DataFrame = {
    registerOn(store.spark)
    val qside = queries.select(
      col(pkCol).as("query_id"), col(embCol).cast("array<double>").as("qe"))
      .withColumn("qnorm", sqrt(dot(col("qe"), col("qe"))))
    val cside = store.read(table)
      .select(col(pkCol).as("cand_id"),
        col(embCol).cast("array<double>").as("ce"))
      .withColumn("cnorm", sqrt(dot(col("ce"), col("ce"))))
    cside.join(broadcast(shortlist), Seq("cand_id"))
      .join(broadcast(qside), Seq("query_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qe"), col("ce")) / (col("qnorm") * col("cnorm"))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("cand_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("cos"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
