package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication (SURVEY.md §2.7 extension): the streaming
  * half of the dedup pipeline — drop exact duplicates as documents
  * arrive, BEFORE they land in the lake, so the batch near-dup passes
  * (MinHash/SimHash) start from an exact-deduped corpus.
  *
  * Keyed by the md5 of the whitespace-normalized lowercased text (the
  * same normalization q_dedup_exact uses), with the watermark bounding
  * state: `dropDuplicatesWithinWatermark` keeps a fingerprint only
  * until the watermark passes it, so state is O(arrival rate ×
  * watermark horizon) instead of O(corpus) — the property that
  * survives an unbounded stream. Duplicates farther apart than the
  * horizon are left to the batch exact-dedup pass; the two stages
  * compose (stream trims the hot window, batch sweeps the lake).
  */
object StreamDedup {

  /** THE exact-dedup fingerprint — the same `Transforms
    * .exactFingerprint` the batch sweep (q_dedup_exact) uses, so the
    * stream stage and the batch sweep agree on what "duplicate" means
    * by construction, not by parallel maintenance.
    */
  def fingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.ingest.Transforms.exactFingerprint(text)

  /** Exact-dedup a (ts, doc_id, text, …) stream within the watermark
    * horizon. Works on batch frames too (falls back to plain
    * dropDuplicates semantics there via the same fingerprint column).
    *
    * Null-text documents (media-only records) are NOT duplicates of
    * each other: dropDuplicates treats null keys as equal, so they get
    * a per-document surrogate fingerprint instead of md5(null)=null.
    */
  def dedupWithinWatermark(
      docs: DataFrame,
      lateness: String = "10 minutes"): DataFrame = {
    val fp = docs.withColumn("__fp",
      coalesce(fingerprint(col("text")),
        concat(lit("null:"), col("doc_id").cast("string"))))
    if (docs.isStreaming)
      fp.withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark("__fp")
        .drop("__fp")
    else fp.dropDuplicates("__fp").drop("__fp")
  }
}
