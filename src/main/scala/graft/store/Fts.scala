package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Transforms

/** Full-text search (SURVEY.md §4.3.2): SQLite FTS5 shadow tables
  * (`/root/reference/utils.py:330-332, 352`) re-expressed as a derived
  * inverted-index table `<table>_fts(pk, token, tf, dl)` maintained
  * alongside the base table, queried by token equi-join. Covers both
  * halves of FTS5 `MATCH`: the AND token predicate (`search`) and
  * relevance order (`searchRanked`, BM25 — FTS5 ranks with bm25() as
  * its default `rank`).
  *
  * The reference keeps the index fresh with sync triggers; here the
  * index rebuild rides the same upsert batch (rebuild-of-affected-keys
  * — the index rows for an upserted pk are replaced wholesale).
  *
  * Scale: the index is a (token, pk) table hash-partitioned by token,
  * so a term lookup is a pruned scan + semi-join; multi-term AND is an
  * intersection of per-term pk sets done as a groupBy count filter —
  * one shuffle, no quadratic step.
  */
object Fts {

  def indexName(table: String): String = s"${table}_fts"

  /** Build/refresh index rows for a batch of (pk, text): one posting
    * per (pk, token) carrying the term frequency and the document's
    * token count — the per-document stats BM25 needs, computed once at
    * index time (FTS5 keeps the same in its docsize shadow table).
    */
  def indexRows(batch: DataFrame, pkCol: String, textCol: String): DataFrame =
    batch
      .select(col(pkCol).as("pk"), Transforms.tokens(col(textCol)).as("toks"))
      .select(col("pk"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("token"))
      .groupBy(col("pk"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .select(col("pk"), col("token"), col("tf"), col("dl"))

  /** Upsert base rows AND their index rows: delete-and-replace the
    * index entries of every pk in the batch (trigger analog).
    */
  def upsertWithIndex(
      store: TableStore,
      table: String,
      batch: DataFrame,
      pkCol: String,
      textCol: String): Unit = {
    // Index FIRST, base table second: `batch` may lazily reference the
    // base table's current parquet files (e.g. a reindex of the table
    // itself), and TableStore's write-swap deletes them — any plan
    // still pointing at the old files would fail afterwards.
    val fresh = indexRows(batch, pkCol, textCol)
    val existing = store.readIfExists(indexName(table))
    val merged = existing match {
      case Some(ex) if !ex.columns.contains("tf") =>
        // pre-ranking index layout (pk, token) from before tf/dl were
        // added: a union would fail to resolve the new columns, so
        // migrate in place — rebuild the postings wholesale from the
        // post-upsert base table (the text lives there)
        indexRows(Upsert.upsert(store.readIfExists(table), batch, Seq(pkCol))
          .select(col(pkCol), col(textCol)), pkCol, textCol)
      case Some(ex) =>
        // drop all index rows of the re-upserted pks, then add fresh
        ex.join(batch.select(col(pkCol).as("pk")).distinct(), Seq("pk"), "left_anti")
          .unionByName(fresh)
      case None => fresh
    }
    store.overwrite(indexName(table), merged)
    store.upsert(table, batch, Seq(pkCol))
  }

  /** FTS5 `MATCH 'w1 w2 …'` (AND semantics): pks containing every
    * query token. Intersection via groupBy-count over the per-term
    * postings — single shuffle on pk.
    */
  def search(spark: SparkSession, store: TableStore, table: String, query: String): DataFrame = {
    val terms = queryTerms(query)
    val idx = store.read(indexName(table))
    idx.filter(col("token").isin(terms: _*))
      .groupBy(col("pk"))
      .agg(countDistinct(col("token")).as("n_terms"))
      .filter(col("n_terms") === terms.size)
      .select(col("pk"))
  }

  /** FTS5 `MATCH … ORDER BY rank`: AND-matched pks scored with BM25
    * (k1=1.2, b=0.75 — FTS5's constants, fts5_aux.c), best first.
    *
    * Corpus stats (N, avgdl) ride a broadcast 1-row aggregate and the
    * per-term document frequencies a broadcast |terms|-row aggregate,
    * so scoring adds no extra shuffle over the unranked search: one
    * groupBy(pk) on the matched postings, everything upstream narrow.
    */
  def searchRanked(
      spark: SparkSession,
      store: TableStore,
      table: String,
      query: String,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val terms = queryTerms(query)
    val idx = store.read(indexName(table))
    val stats = idx.select(col("pk"), col("dl")).distinct()
      .agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
    val matched = idx.filter(col("token").isin(terms: _*))
    val docFreq = matched.groupBy(col("token"))
      .agg(countDistinct(col("pk")).cast("double").as("df"))
    matched
      .join(broadcast(docFreq), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("s",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("pk"))
      .agg(countDistinct(col("token")).as("n_terms"), sum(col("s")).as("score"))
      .filter(col("n_terms") === terms.size)
      .select(col("pk"), col("score"))
      .orderBy(col("score").desc, col("pk"))
  }

  private def queryTerms(query: String): Seq[String] =
    query.toLowerCase(java.util.Locale.ROOT)
      .split("\\W+").filter(_.nonEmpty).distinct.toSeq
}
