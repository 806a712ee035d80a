package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted character-trigram postings — the store-side form of
  * q_substring_search's inline prune (FTS5's `trigram` tokenizer
  * role: accelerate arbitrary LIKE '%needle%' predicates without a
  * full-corpus scan). One row per (doc, distinct trigram), Hive-
  * partitioned by a pk-hash bucket so maintenance is O(batch): a
  * batch rewrites only the bucket directories its pks hash into
  * (the [[Fts]] bucketed-postings discipline, minus the positional
  * machinery substring match doesn't need — containment of ALL
  * needle trigrams, then exact verification).
  *
  * Search: needle trigrams → `IN`-pruned postings scan → per-doc
  * all-present count (the AND-of-terms shape of [[Fts.search]]) →
  * exact `contains` verification against the base table, reading only
  * the candidates. Needles shorter than 3 chars have no trigrams to
  * prune with and fall back to the direct scan.
  */
object Trigram {

  def indexName(table: String): String = s"${table}_tri"

  private val BucketCol = "pk_bucket"
  private[store] val nBuckets = 16

  private def gramRows(
      batch: DataFrame, pkCol: String, textCol: String): DataFrame =
    batch
      // docs shorter than 3 chars produce a DESCENDING sequence (junk
      // grams) — and cannot match any trigram-prunable needle
      .filter(length(col(textCol)) >= 3)
      // bind the lowered text ONCE — lowering inside the transform
      // lambda would redo O(len) work per gram position (O(len²)/doc)
      .select(col(pkCol).as("pk"),
        pmod(xxhash64(col(pkCol)), lit(nBuckets.toLong)).as(BucketCol),
        lower(col(textCol)).as("_t"))
      .select(col("pk"), col(BucketCol),
        explode(array_distinct(transform(
          sequence(lit(1), length(col("_t")) - 2),
          i => col("_t").substr(i, lit(3))))).as("g"))

  /** Upsert rows into the base table AND their trigram postings: only
    * the batch pks' bucket directories rewrite; stale grams of
    * re-upserted docs drop via the anti-join; a bucket left empty
    * (every doc in it re-upserted to sub-trigram text) drops
    * explicitly. Index maintenance runs FIRST and the base table
    * swaps LAST (the [[Fts.upsertWithIndexCols]] ordering): the swap
    * deletes the old base files, so a batch derived from
    * `store.read(table)` — the reindex case — must be fully
    * materialized before the base rewrite.
    */
  def upsertWithIndex(
      store: TableStore, table: String, batch: DataFrame,
      pkCol: String, textCol: String): Unit = {
    val fresh = Iteration.materialize(gramRows(batch, pkCol, textCol))
    val batchPks = Iteration.materialize(
      batch.select(col(pkCol).as("pk")).distinct())
    // buckets the BATCH pks hash into — includes pks whose new text
    // has no grams (their stale rows must still drop)
    val touched = batchPks
      .select(pmod(xxhash64(col("pk")), lit(nBuckets.toLong)).as(BucketCol))
      .distinct().collect().map(_.getLong(0)).toSeq
    store.readIfExists(indexName(table)) match {
      case Some(idx0) =>
        val idx = idx0.withColumn(BucketCol, col(BucketCol).cast("long"))
        val merged = Iteration.materialize(
          idx.filter(col(BucketCol).isin(touched: _*))
            .join(batchPks, Seq("pk"), "left_anti")
            .unionByName(fresh)
            .repartition(col(BucketCol)))
        store.overwritePartitions(indexName(table), merged, Seq(BucketCol))
        val stillThere = merged.select(col(BucketCol)).distinct()
          .collect().map(_.getLong(0)).toSet
        touched.filterNot(stillThere).foreach(b =>
          store.dropPartition(indexName(table), BucketCol, b.toString))
      case None =>
        // an all-short-text first batch has no gram rows; writing a
        // zero-file partitioned dir would leave an unreadable index —
        // leave the index absent (search falls back to a direct scan)
        if (!fresh.isEmpty)
          store.overwrite(indexName(table),
            fresh.repartition(col(BucketCol)), partitionBy = Seq(BucketCol))
    }
    store.upsert(table, batch, Seq(pkCol))
  }

  /** All pks whose text contains `needle` (case-folded, like FTS5
    * trigram's default): trigram-pruned candidates, then exact
    * verification reading only those docs. Falls back to the direct
    * scan when the needle is sub-trigram or the index was never built
    * (all-short-text corpus).
    */
  def substringSearch(
      store: TableStore, table: String, pkCol: String, textCol: String,
      needle: String): DataFrame = {
    // Locale.ROOT + code-point windows: the JVM's default-locale
    // toLowerCase (Turkish dotless-i) and UTF-16 String#sliding
    // (surrogate-pair halves) would produce needle grams Spark's
    // locale-agnostic lower()/code-point substr never indexes — a
    // silent pruned-away match
    val n = needle.toLowerCase(java.util.Locale.ROOT)
    val base = store.read(table)
    if (n.codePointCount(0, n.length) < 3 || !store.exists(indexName(table)))
      return base.filter(lower(col(textCol)).contains(n))
        .select(col(pkCol)).orderBy(col(pkCol))
    val cps = n.codePoints.toArray
    val nGrams = (0 to cps.length - 3)
      .map(i => new String(cps, i, 3)).distinct
    val cands = store.read(indexName(table))
      .filter(col("g").isin(nGrams: _*))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") === nGrams.length)
      .select(col("pk").as(pkCol))
    base.join(cands, Seq(pkCol), "left_semi")
      .filter(lower(col(textCol)).contains(n))
      .select(col(pkCol))
      .orderBy(col(pkCol))
  }
}
