package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization as a maintained store component — the
  * persisted-index analog of [[Fts]] for the vector-search side of the
  * pipeline (SURVEY.md extensions; reference has no counterpart — its
  * store is SQLite, ours must hold 100 TB of embeddings).
  *
  * A d-dim vector splits into `slices` subvectors of `subDim` dims;
  * each subspace gets a k-entry codebook (TRAINED here with a joint
  * Lloyd loop — all subspaces in one distributed iteration, not
  * `slices` sequential jobs), and a vector is stored as its
  * `slices` nearest-codeword ids — 32× smaller than raw floats at the
  * 8×8/16 default. ADC search then scans the CODE table against a
  * per-query lookup table and never touches candidate floats: 8 bytes
  * read per candidate instead of 256 — the genuine 100 TB
  * read-reduction shape.
  *
  * Two tables ride the [[TableStore]]:
  *  - `<table>_pq_books` (s, cent_id, ce): the per-subspace codebooks,
  *    written once at training time (small — slices × k rows);
  *  - `<table>_pq` (pk, codes): one row per vector — codes as a
  *    BinaryType blob, one unsigned byte per subspace (1 B/slice in
  *    Tungsten rows and on disk, the genuine 32× at 8×8/16) —
  *    maintained with the same upsert-batch pattern as the FTS
  *    postings: re-upserted vectors get their codes re-encoded
  *    O(batch), never O(corpus).
  *
  * Determinism: codeword means update on 1e-6-quantized integers
  * (exact, commutative sums on any partitioning — same convention as
  * the k-means step in queries/SimilarityOps); argmin ties break on
  * the lower cent_id; LUT distances quantize to longs before summing.
  */
object Pq {

  def codesName(table: String): String = s"${table}_pq"
  def booksName(table: String): String = s"${table}_pq_books"

  /** Squared L2 between two equal-length vector columns, as a
    * sequential left-fold (bit-exact regardless of partitioning).
    */
  private[store] def l2sq(a: Column, b: Column): Column =
    graft.functions.SliceDists.l2Fold(
      org.apache.spark.sql.SparkSession.active, a, b)

  /** Exploded subvector rows (pk, s, sv): one row per vector and
    * subspace, `sv` = dims [s*subDim, (s+1)*subDim).
    */
  def subvectors(
      emb: DataFrame, pkCol: String, embCol: String,
      slices: Int, subDim: Int): DataFrame =
    emb.select(col(pkCol).as("pk"),
        explode(array((0 until slices).map { s =>
          struct(lit(s).as("s"),
            slice(col(embCol), s * subDim + 1, subDim).as("sv"))
        }: _*)).as("x"))
      .select(col("pk"), col("x.s").as("s"), col("x.sv").as("sv"))

  /** Seed codebooks: the k lowest-pk vectors' slices, cent_ids
    * renumbered 0..k-1 — the deterministic cold-start convention
    * (production trains from here with [[trainBooks]]).
    */
  def seedBooks(
      emb: DataFrame, pkCol: String, embCol: String,
      slices: Int, subDim: Int, k: Int): DataFrame = {
    // limit FIRST (TakeOrderedAndProject, k rows) so the renumbering
    // window only ever sees k rows — a global row_number over the
    // corpus would funnel 100 TB through one partition
    val seeds = emb.orderBy(col(pkCol)).limit(k)
      .withColumn("cent_id",
        row_number().over(Window.orderBy(col(pkCol))) - 1)
    subvectors(seeds, pkCol, embCol, slices, subDim)
      .join(seeds.select(col(pkCol).as("pk"), col("cent_id")), Seq("pk"))
      .select(col("s"), col("cent_id"), col("sv").as("ce"))
  }

  /** Train all `slices` codebooks jointly: one Lloyd loop over the
    * exploded (s, sv) rows, assignment = argmin squared-L2 against the
    * broadcast books (equi-join on s — each subvector only scores its
    * own subspace's k codewords), update = per-(s, cell, dim)
    * quantized-integer mean. Empty cells keep their previous codeword.
    * Each iteration pins through [[Iteration.materialize]] (reliable
    * checkpoint when a dir is configured — the same fault-tolerance
    * seam as kmeansTrain).
    */
  def trainBooks(
      emb: DataFrame, pkCol: String, embCol: String,
      slices: Int, subDim: Int, k: Int, iters: Int): DataFrame = {
    val sub = subvectors(emb, pkCol, embCol, slices, subDim)
    var books = Iteration.materialize(
      seedBooks(emb, pkCol, embCol, slices, subDim, k))
    (1 to iters).foreach { _ =>
      val assignment = sub.join(broadcast(books), Seq("s"))
        .select(col("pk"), col("s"), col("sv"), col("cent_id"),
          l2sq(col("sv"), col("ce")).as("_d"))
        .groupBy(col("pk"), col("s"))
        .agg(min_by(struct(col("sv"), col("cent_id").as("cell")),
          struct(col("_d"), col("cent_id"))).as("_best"))
        .select(col("s"), col("_best.cell").as("cell"), col("_best.sv").as("sv"))
      val updated = assignment
        .select(col("s"), col("cell"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("s"), col("cell"), col("pos"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("v") * 1e6).cast("long")).as("q"))
        .select(col("s"), col("cell"), col("pos"),
          ((col("q").cast("double") / 1e6) / col("n").cast("double")).as("m"))
        .groupBy(col("s"), col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("new_ce"))
      books = Iteration.materialize(books
        .join(updated.withColumnRenamed("cell", "cent_id"), Seq("s", "cent_id"), "left")
        .select(col("s"), col("cent_id"),
          coalesce(col("new_ce"), col("ce")).as("ce")))
    }
    books
  }

  /** Exploded (pk, s, code) rows: each subvector replaced by its
    * nearest codeword id in that subspace's book — broadcast equi-join
    * on s, min_by partial-agg argmin (one row per (vector, slice)
    * crosses the exchange, not the ×k scored set).
    */
  def encodeExploded(
      emb: DataFrame, books: DataFrame, pkCol: String, embCol: String,
      slices: Int, subDim: Int): DataFrame =
    subvectors(emb, pkCol, embCol, slices, subDim)
      .join(broadcast(books), Seq("s"))
      .select(col("pk"), col("s"), col("cent_id"),
        l2sq(col("sv"), col("ce")).as("_d"))
      .groupBy(col("pk"), col("s"))
      .agg(min_by(col("cent_id"), struct(col("_d"), col("cent_id"))).as("code"))

  /** One (pk, codes) row per vector — the persisted code-table layout:
    * a BinaryType blob, one unsigned byte per subspace in subspace
    * order (`codes[s]` = subspace s's codeword; the FAISS uint8
    * layout, 1 B/slice in Tungsten rows and on disk).
    */
  def encode(
      emb: DataFrame, books: DataFrame, pkCol: String, embCol: String,
      slices: Int, subDim: Int): DataFrame =
    encodeExploded(emb, books, pkCol, embCol, slices, subDim)
      .groupBy(col("pk"))
      .agg(transform(array_sort(collect_list(struct(col("s"), col("code")))),
        x => x.getField("code")).as("codes"))
      .select(col("pk"),
        graft.functions.SliceDists.packCodes(
          org.apache.spark.sql.SparkSession.active, col("codes")).as("codes"))

  /** Total squared quantization error of encoding `emb` with `books`
    * — the objective Lloyd minimizes; a trained book must score lower
    * than its seed. Exact-sum via 1e-6 quantization so the comparison
    * is partitioning-independent.
    */
  def quantizationError(
      emb: DataFrame, books: DataFrame, pkCol: String, embCol: String,
      slices: Int, subDim: Int): Double = {
    val q = subvectors(emb, pkCol, embCol, slices, subDim)
      .join(broadcast(books), Seq("s"))
      .select(col("pk"), col("s"), l2sq(col("sv"), col("ce")).as("_d"))
      .groupBy(col("pk"), col("s"))
      .agg(min(col("_d")).as("best"))
      .agg(sum(floor(col("best") * 1e6).cast("long")).as("q"))
      .head.getLong(0)
    q / 1e6
  }

  /** Per-query ADC lookup table (query_id, s, code, qd): squared-L2 of
    * each query subvector against every codeword, 1e-6-quantized to
    * longs so candidate sums are exact and commutative.
    */
  def lut(
      queries: DataFrame, books: DataFrame, pkCol: String, embCol: String,
      slices: Int, subDim: Int): DataFrame =
    subvectors(queries, pkCol, embCol, slices, subDim)
      .join(broadcast(books), Seq("s"))
      .select(col("pk").as("query_id"), col("s"), col("cent_id").as("code"),
        floor(l2sq(col("sv"), col("ce")) * 1e6).cast("long").as("qd"))

  /** Train-and-persist: write `<table>_pq_books` (trained from the
    * batch corpus) and seed `<table>_pq` with the batch's codes.
    */
  def buildIndex(
      store: TableStore, table: String, emb: DataFrame,
      pkCol: String, embCol: String,
      slices: Int = 8, subDim: Int = 8, k: Int = 16, iters: Int = 3): Unit = {
    val books = trainBooks(emb, pkCol, embCol, slices, subDim, k, iters)
    store.overwrite(booksName(table), books)
    upsertWithCodes(store, table, emb, pkCol, embCol, slices, subDim)
  }

  /** Upsert embedding rows AND their PQ codes: the batch is encoded
    * against the persisted books (O(batch) — the corpus is never
    * re-encoded) and upserted into `<table>_pq` keyed by pk, then the
    * base table upserts as usual. Requires `buildIndex` (or a manual
    * books write) first.
    */
  def upsertWithCodes(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String,
      slices: Int = 8, subDim: Int = 8): Unit = {
    refreshCodes(store, table, batch, pkCol, embCol, slices, subDim)
    store.upsert(table, batch, Seq(pkCol))
  }

  /** The codes half of [[upsertWithCodes]] — no base write (the SQL
    * DML maintenance seam, [[IndexMaintain]]); records provenance.
    */
  private[store] def refreshCodes(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, embCol: String,
      slices: Int = 8, subDim: Int = 8): Unit = {
    IndexMaintain.recordIfChanged(store, codesName(table), Map(
      "table" -> table, "family" -> "pq", "pk" -> pkCol, "emb" -> embCol,
      "slices" -> slices.toString, "subDim" -> subDim.toString))
    val books = store.read(booksName(table))
    val fresh = encode(batch, books, pkCol, embCol, slices, subDim)
    store.upsert(codesName(table), fresh, Seq("pk"))
  }

  /** ADC top-k over the PERSISTED code table: the per-query LUT from
    * the stored books flattens to one row-major array<long> (slices ×
    * k entries, broadcast), and each candidate's distance is ONE
    * native [[graft.functions.AdcDist]] fold of its code blob — a
    * map-only scan, no per-slice row blowup, no aggregate exchange on
    * (query, cand); the only shuffle left is the WindowGroupLimit
    * top-k's. Distances are bit-identical to the former explode/join/
    * groupBy form (same quantized longs, long addition commutes). The
    * corpus embeddings are never read — the scan side is 1 code blob
    * per vector.
    */
  def annTopK(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int,
      slices: Int = 8, subDim: Int = 8): DataFrame =
    annSearch(store, table, queries, pkCol, embCol, k, slices, subDim, None)

  /** Filtered ADC top-k: candidates restricted to the pks in
    * `allowed` (one column), semi-joined onto the code scan before
    * the ADC fold — the pre-filter design shared across the served
    * family (see [[Sq.annTopKFiltered]]): selectivity-proportional
    * cost, k results whenever k matches exist, codebooks untouched
    * (an index property can never depend on a predicate).
    */
  def annTopKFiltered(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int, allowed: DataFrame,
      slices: Int = 8, subDim: Int = 8): DataFrame =
    annSearch(store, table, queries, pkCol, embCol, k, slices, subDim,
      Some(allowed))

  private def annSearch(
      store: TableStore, table: String, queries: DataFrame,
      pkCol: String, embCol: String, k: Int,
      slices: Int, subDim: Int, allowed: Option[DataFrame]): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    val books = store.read(booksName(table))
    // one (query_id, lut_arr) row per query: qd sorted by (s, code) is
    // exactly the s·k + code row-major order AdcDist indexes
    val ql = lut(queries, books, pkCol, embCol, slices, subDim)
      .groupBy(col("query_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("s"), col("code"), col("qd")))),
        x => x.getField("qd")).as("lut_arr"))
    val scan0 = store.read(codesName(table))
      .select(col("pk").as("cand_id"), col("codes"))
    val scan = allowed.fold(scan0)(
      AnnFilter.semiJoinAllowed(scan0, _, "cand_id"))
    scan
      .crossJoin(broadcast(ql))
      .select(col("query_id"), col("cand_id"),
        graft.functions.SliceDists.adcDist(spark, col("codes"), col("lut_arr"))
          .as("adist"))
      // a NULL adist is a degenerate blob the aggregate form would
      // never have produced a row for — absent, not ranked
      .filter(col("adist").isNotNull)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adist"), col("cand_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("adist"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
