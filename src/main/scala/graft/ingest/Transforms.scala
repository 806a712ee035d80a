package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-level scalar transforms from SURVEY.md §2.2, re-expressed as
  * reusable `Column` functions (codegen-friendly builtins, no UDFs in
  * the hot path).
  */
object Transforms {

  /** T1 component (`/root/reference/utils.py:299-310`): the reference
    * runs `html.unescape` over tweet text. Spark-side: chained
    * `replace` for the named XML entities plus the numeric refs the
    * golden fixtures exercise (`&amp; &lt; &gt; &quot; &#39;`).
    * `&amp;` must be decoded LAST so `&amp;lt;` → `&lt;` (not `<`),
    * matching Python html.unescape's longest-match behavior for the
    * already-decoded cases the fixtures contain.
    */
  def htmlUnescape(c: Column): Column = {
    val pairs = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
    pairs.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
  }

  /** T1 (`/root/reference/utils.py:310`): parse Twitter's
    * `"Mon Sep 02 14:19:58 +0000 2019"` created_at format. Spark 3+
    * forbids day-of-week letters when PARSING, so the weekday prefix is
    * stripped first (it is redundant).
    */
  def parseTwitterTime(c: Column): Column =
    to_timestamp(substring(c, 5, 26), "MMM dd HH:mm:ss Z yyyy")

  /** T1 output shape: ISO-8601 string with +00:00 offset, matching the
    * reference's stored form `"2019-09-02T14:19:58+00:00"`
    * (`/root/reference/tests/test_save_tweets.py:217`).
    */
  def isoFormat(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ssxxx")

  /** T3 (`/root/reference/utils.py:275-281` expand_entities): fold a
    * (search → replacement) array over a text column — the reference
    * replaces each t.co short URL with its expanded_url. Higher-order
    * `aggregate` keeps it inside codegen; replacements apply in array
    * order, exactly like the reference's sequential `str.replace`.
    */
  def expandEntities(text: Column, replacements: Seq[(String, String)]): Column = {
    val entries = array(replacements.map { case (k, v) =>
      struct(lit(k).as("k"), lit(v).as("v"))
    }: _*)
    aggregate(entries, text, (acc, e) =>
      replace(acc, e.getField("k"), e.getField("v")))
  }

  /** T4 (`/root/reference/utils.py:668-673` + pattern at utils.py:35):
    * parse `<a href="URL" ...>NAME</a>` source HTML into (url, name).
    */
  val sourceAnchorPattern = "<a href=\"(.*?)\".*?>(.*?)</a>"
  def sourceUrl(c: Column): Column = regexp_extract(c, sourceAnchorPattern, 1)
  def sourceName(c: Column): Column = regexp_extract(c, sourceAnchorPattern, 2)

  /** Tokenizer shared by FTS / dedup / text-stats: lowercase, split on
    * non-word runs, drop empties (mirrors the FTS5 unicode61 tokenizer
    * to the extent SURVEY §7.3 scopes it: token match, not ranking).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => t =!= "")

  /** Exact-dedup fingerprint shared by the batch sweep
    * (queries/DedupOps) and the streaming stage (streaming/
    * StreamDedup) — ONE definition of "duplicate": md5 of the
    * lowercased text with non-word runs collapsed to single spaces,
    * trimmed. (md5 because the DuckDB oracle computes it identically.)
    */
  def exactFingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\W+", " ")))

  /** Word n-gram shingles over `tokens` (for MinHash / Jaccard dedup).
    * Guarded: `sequence(0, negative)` would count DOWN in Spark, so
    * short documents yield an empty shingle set explicitly.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        j => concat_ws(" ", slice(toks, j + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
}
