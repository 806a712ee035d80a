package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Transforms

/** Full-text search (SURVEY.md §4.3.2): SQLite FTS5 shadow tables
  * (`/root/reference/utils.py:330-332, 352`) re-expressed as a derived
  * inverted-index table `<table>_fts(token, pk)` maintained alongside
  * the base table, queried by token equi-join. Scope per SURVEY §7.3:
  * token match (AND semantics of FTS5 `MATCH 'a b'`), not ranking.
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

  /** Build/refresh index rows for a batch of (pk, text). */
  def indexRows(batch: DataFrame, pkCol: String, textCol: String): DataFrame =
    batch.select(col(pkCol).as("pk"),
      explode(array_distinct(Transforms.tokens(col(textCol)))).as("token"))

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
    val terms = query.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty).distinct.toSeq
    val idx = store.read(indexName(table))
    idx.filter(col("token").isin(terms: _*))
      .groupBy(col("pk"))
      .agg(countDistinct(col("token")).as("n_terms"))
      .filter(col("n_terms") === terms.size)
      .select(col("pk"))
  }
}
