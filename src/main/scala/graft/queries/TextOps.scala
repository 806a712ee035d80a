package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.Transforms

/** The reference's row-level text transforms (SURVEY.md §2.2 T1-T4) and
  * the FTS surface (§4.3), demonstrated over `documents`/`events`
  * testdata (role mapping in FIXTURES.md §3: documents.text ≈
  * tweets.full_text, events.props ≈ entities JSON). The Twitter-schema
  * versions of the same transforms are exercised by the golden-fixture
  * ScalaTest suites.
  */
object TextOps {

  // ---------------------------------------------------------------------
  // q_ts_roundtrip — T1 (`utils.py:310`): Twitter created_at parse →
  // ISO-8601 output. The Twitter-format string is constructed from
  // events.ts (testdata carries no such strings), then parsed back with
  // the engine's parser and rendered ISO.
  def tsRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = concat(
      date_format(col("ts"), "EEE MMM dd HH:mm:ss"),
      lit(" +0000 "),
      date_format(col("ts"), "yyyy"))
    Catalog.table(spark, sfDir, "events")
      .filter(col("event_id") < 1000)
      .select(
        col("event_id"),
        raw.as("twitter_ts"),
        Transforms.isoFormat(Transforms.parseTwitterTime(raw)).as("iso_ts"))
      .orderBy(col("event_id"))
  }

  val tsRoundtripSql: String =
    """SELECT event_id,
      |  strftime(ts, '%a %b %d %H:%M:%S') || ' +0000 ' || strftime(ts, '%Y') AS twitter_ts,
      |  strftime(strptime(strftime(ts, '%a %b %d %H:%M:%S') || ' +0000 ' || strftime(ts, '%Y'),
      |           '%a %b %d %H:%M:%S +0000 %Y'), '%Y-%m-%dT%H:%M:%S+00:00') AS iso_ts
      |FROM events WHERE event_id < 1000
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_entity_expand — T3 (`utils.py:275-281`): sequential fold of
  // (short → expanded) replacements over text, as a higher-order
  // `aggregate` (stays in codegen; no UDF). Oracle: the same fold
  // unrolled as nested REPLACE calls.
  private val expansions = Seq(
    " agg " -> " aggregation ",
    " hash " -> " hashtable ",
    " scan " -> " tablescan ")

  def entityExpand(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        md5(Transforms.expandEntities(col("text"), expansions)).as("expanded_md5"))
      .orderBy(col("doc_id"))

  val entityExpandSql: String =
    """SELECT doc_id,
      |  md5(replace(replace(replace(text, ' agg ', ' aggregation '), ' hash ', ' hashtable '), ' scan ', ' tablescan ')) AS expanded_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_source_extract — T4 (`utils.py:668-673`): regex-parse the
  // `<a href="URL">NAME</a>` source anchor into (url, name) and build
  // the distinct `sources` dimension. Anchor strings are constructed
  // from documents.source, then parsed with the engine's pattern.
  def sourceExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val anchor = concat(
      lit("<a href=\"http://example.com/"), col("source"),
      lit("\" rel=\"nofollow\">"), upper(col("source")), lit("</a>"))
    Catalog.table(spark, sfDir, "documents")
      .select(anchor.as("source_html"))
      .select(
        Transforms.sourceUrl(col("source_html")).as("url"),
        Transforms.sourceName(col("source_html")).as("name"))
      .distinct()
      .orderBy(col("url"))
  }

  val sourceExtractSql: String =
    """SELECT DISTINCT
      |  regexp_extract('<a href="http://example.com/' || source || '" rel="nofollow">' || upper(source) || '</a>', '<a href="(.*?)".*?>(.*?)</a>', 1) AS url,
      |  regexp_extract('<a href="http://example.com/' || source || '" rel="nofollow">' || upper(source) || '</a>', '<a href="(.*?)".*?>(.*?)</a>', 2) AS name
      |FROM documents
      |ORDER BY url""".stripMargin

  // ---------------------------------------------------------------------
  // q_html_unescape — T1 component: html.unescape over entity-laden
  // text (constructed; fixtures' real entities are covered by the
  // golden ScalaTest).
  def htmlUnescape(spark: SparkSession, sfDir: String): DataFrame = {
    val encoded = concat(
      lit("A &amp; B &lt;"), col("source"),
      lit("&gt; &quot;q&quot; &#39;s&#39; &amp;lt;stay&amp;gt;"))
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), Transforms.htmlUnescape(encoded).as("unescaped"))
      .orderBy(col("doc_id"))
  }

  val htmlUnescapeSql: String =
    """SELECT doc_id,
      |  replace(replace(replace(replace(replace(
      |    'A &amp; B &lt;' || source || '&gt; &quot;q&quot; &#39;s&#39; &amp;lt;stay&amp;gt;',
      |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', CHR(39)), '&amp;', '&') AS unescaped
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_json_extract — entity-JSON access (events.props ≈ entities JSON;
  // reference stores nested JSON as text, SURVEY §1.3): extract, cast,
  // aggregate.
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "events")
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  val jsonExtractSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_fts_index — §4.3 FTS: the inverted-index build (explode tokens →
  // (token, doc_id)) plus a term-lookup aggregation — the Spark
  // re-expression of the FTS5 shadow tables (`utils.py:330-332`).
  def ftsIndex(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(Transforms.tokens(col("text")))).as("token"))
      .filter(col("token").isin("spark", "join", "stream", "window"))
      .groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("token"))

  val ftsIndexSql: String =
    """SELECT token, COUNT(DISTINCT doc_id) AS n_docs
      |FROM (
      |  SELECT doc_id, unnest(list_distinct(list_filter(string_split_regex(lower(text), '\W+'), t -> t <> ''))) AS token
      |  FROM documents
      |)
      |WHERE token IN ('spark', 'join', 'stream', 'window')
      |GROUP BY token
      |ORDER BY token""".stripMargin

  // ---------------------------------------------------------------------
  // q_fts_match — FTS MATCH-style predicate: docs containing BOTH terms
  // (AND semantics of `MATCH 'spark join'`), via word-boundary regex.
  def ftsMatch(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .filter(
        lower(col("text")).rlike("\\bspark\\b") &&
          lower(col("text")).rlike("\\bvector\\b"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  val ftsMatchSql: String =
    """SELECT doc_id, lang FROM documents
      |WHERE regexp_matches(lower(text), '\bspark\b') AND regexp_matches(lower(text), '\bvector\b')
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_fts_ranked — FTS MATCH with relevance ORDER (FTS5 `ORDER BY
  // rank`, utils.py:330-332 creates a ranking FTS5 index): AND-matched
  // docs ordered by total term frequency. The oracle-checked score is
  // the integer tf sum (bit-exact across engines); the full BM25
  // scorer (floats, corpus stats) lives in store/Fts.searchRanked and
  // is order-asserted in FtsSpec.
  def ftsRanked(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), explode(Transforms.tokens(col("text"))).as("token"))
      .filter(col("token").isin("spark", "vector"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("score"), countDistinct(col("token")).as("n_terms"))
      .filter(col("n_terms") === 2)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))

  val ftsRankedSql: String =
    """SELECT doc_id, COUNT(*) AS score
      |FROM (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')) AS token
      |  FROM documents
      |)
      |WHERE token IN ('spark', 'vector')
      |GROUP BY doc_id
      |HAVING COUNT(DISTINCT token) = 2
      |ORDER BY score DESC, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_fts_phrase — FTS5 phrase MATCH (`MATCH '"spark vector"'`,
  // utils.py:330-332 FTS5 tables accept phrase syntax): docs whose
  // token stream contains the words CONSECUTIVELY, not merely both.
  // Built on positional postings (sorted position lists — FTS5's
  // poslist, same layout store/Fts persists): one token-pruned
  // aggregation pass collects both words' position lists per doc, then
  // shift-and-intersect verifies adjacency. The oracle states the same
  // predicate as a word-boundary regex — equivalent because tokens are
  // exactly the \W+ splits, so "consecutive tokens" ⟺
  // `\bspark\W+vector\b`.
  def ftsPhrase(spark: SparkSession, sfDir: String): DataFrame =
    wordPositions(spark, sfDir, "spark", "vector")
      .filter(size(array_intersect(transform(col("pa"), x => x + 1), col("pb"))) > 0)
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  /** Both words' sorted position lists in ONE aggregation pass —
    * `collect_list` drops the `when`'s nulls, so a single groupBy
    * replaces the two-branch join (Spark has no cross-branch CSE: the
    * join formulation scanned and tokenized the corpus twice; verified
    * against the plan).
    */
  private def wordPositions(
      spark: SparkSession, sfDir: String, wa: String, wb: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        posexplode(Transforms.tokens(col("text"))).as(Seq("pos", "token")))
      .filter(col("token").isin(wa, wb))
      .groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(when(col("token") === wa, col("pos")))).as("pa"),
        sort_array(collect_list(when(col("token") === wb, col("pos")))).as("pb"))
      .filter(size(col("pa")) > 0 && size(col("pb")) > 0)

  val ftsPhraseSql: String =
    """SELECT doc_id FROM documents
      |WHERE regexp_matches(lower(text), '\bspark\W+vector\b')
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_fts_near — FTS5 proximity MATCH (`MATCH 'NEAR(spark vector, 3)'`):
  // docs where the tokens occur within 3 intervening tokens, either
  // order — |posA - posB| <= 4. Same positional-postings shape as
  // q_fts_phrase with a span predicate instead of shift-intersect; the
  // oracle states the identical check with nested list lambdas (its
  // 1-based positions cancel in the difference).
  def ftsNear(spark: SparkSession, sfDir: String): DataFrame =
    wordPositions(spark, sfDir, "spark", "vector")
      .filter(exists(col("pa"), x =>
        exists(col("pb"), y => abs(x - y) <= lit(4))))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  val ftsNearSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    s"""SELECT doc_id FROM (
       |  SELECT doc_id,
       |    list_filter(range(1, len(toks) + 1), i -> toks[i] = 'spark') AS pa,
       |    list_filter(range(1, len(toks) + 1), i -> toks[i] = 'vector') AS pb
       |  FROM (SELECT doc_id, $toks AS toks FROM documents)
       |)
       |WHERE len(pa) > 0 AND len(pb) > 0
       |  AND len(list_filter(pa, x -> len(list_filter(pb, y -> abs(x - y) <= 4)) > 0)) > 0
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_fts_near_multi — FTS5 NEAR with 3+ phrases (`MATCH 'NEAR(spark
  // vector join, 4)'`): all phrases cluster inside a window of ≤ n +
  // Σ phrase-lengths tokens — FTS5's clustering rule, which the
  // 2-token q_fts_near is the special case of. Same one-pass
  // positional-postings shape; the window check is a nested EXISTS
  // over the three (short) position lists. The oracle states the
  // identical rule with nested list lambdas (its 1-based positions
  // cancel in the max−min span).
  def ftsNearMulti(spark: SparkSession, sfDir: String): DataFrame = {
    val words = Seq("spark", "vector", "join")
    val posCols = words.indices.map(i => col(s"p$i"))
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        posexplode(Transforms.tokens(col("text"))).as(Seq("pos", "token")))
      .filter(col("token").isin(words: _*))
      .groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(when(col("token") === words(0), col("pos"))))
          .as("p0"),
        sort_array(collect_list(when(col("token") === words(1), col("pos"))))
          .as("p1"),
        sort_array(collect_list(when(col("token") === words(2), col("pos"))))
          .as("p2"))
      .filter(posCols.map(size(_) > 0).reduce(_ && _))
      .filter(exists(col("p0"), x => exists(col("p1"), y =>
        exists(col("p2"), z =>
          greatest(x, y, z) - least(x, y, z) + 1 <= lit(4 + 3)))))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val ftsNearMultiSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    s"""SELECT doc_id FROM (
       |  SELECT doc_id,
       |    list_filter(range(1, len(toks) + 1), i -> toks[i] = 'spark') AS pa,
       |    list_filter(range(1, len(toks) + 1), i -> toks[i] = 'vector') AS pb,
       |    list_filter(range(1, len(toks) + 1), i -> toks[i] = 'join') AS pc
       |  FROM (SELECT doc_id, $toks AS toks FROM documents)
       |)
       |WHERE len(pa) > 0 AND len(pb) > 0 AND len(pc) > 0
       |  AND len(list_filter(pa, x -> len(list_filter(pb, y ->
       |    len(list_filter(pc, z ->
       |      greatest(x, y, z) - least(x, y, z) + 1 <= 4 + 3)) > 0)) > 0)) > 0
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_fts_prefix — FTS5 prefix MATCH (`MATCH 'wind*'`): docs containing
  // any token with the prefix. On the indexed path (store/Fts.search)
  // this is a startsWith range predicate pushed to the postings scan;
  // here the same semantics over the corpus, AND-composed with a plain
  // term the way a saved Datasette search would write it.
  def ftsPrefix(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), Transforms.tokens(col("text")).as("toks"))
      .filter(exists(col("toks"), t => t.startsWith("wind")) &&
        array_contains(col("toks"), "spark"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  val ftsPrefixSql: String =
    """SELECT doc_id FROM (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '') AS toks
      |  FROM documents
      |)
      |WHERE len(list_filter(toks, t -> t LIKE 'wind%')) > 0
      |  AND list_contains(toks, 'spark')
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_fts_bool — FTS5 boolean MATCH (`MATCH 'spark OR vector NOT window'`,
  // the OR/NOT operators of utils.py:330-332's FTS5 tables): at FTS5
  // precedence (NOT > AND > OR, fts5parse.y) the query groups as
  // spark OR (vector NOT window). On the indexed path (store/Fts.search)
  // OR is a union of pk sets and NOT a left-anti join; here the same
  // predicate over the corpus as token-set membership, so the oracle
  // can state it as boolean list_contains logic.
  def ftsBool(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), Transforms.tokens(col("text")).as("toks"))
      .filter(
        array_contains(col("toks"), "spark") ||
          (array_contains(col("toks"), "vector") &&
            !array_contains(col("toks"), "window")))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  val ftsBoolSql: String =
    """SELECT doc_id FROM (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '') AS toks
      |  FROM documents
      |)
      |WHERE list_contains(toks, 'spark')
      |   OR (list_contains(toks, 'vector') AND NOT list_contains(toks, 'window'))
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_fts_col — FTS5 column-filtered MATCH (`MATCH 'small p_type:economy'`
  // against an index over (p_name, p_type) — the multi-column FTS shape
  // of the reference's users index over name/screen_name/description/
  // location, utils.py:352). An unscoped term matches ANY indexed
  // column; a `col:term` filter restricts the term to that column
  // (store/Fts.scala ColFiltered, evaluated as an `fcol = c` predicate
  // on the postings scan). `part` is the multi-column analog in the
  // testdata: 'small' occurs in both p_name ("small gizmo") and p_type
  // ("SMALL"), so the unscoped term genuinely exercises the any-column
  // union, while p_type:economy prunes to one column's postings.
  def ftsCol(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "part")
      .select(col("p_partkey"),
        Transforms.tokens(col("p_name")).as("name_toks"),
        Transforms.tokens(col("p_type")).as("type_toks"))
      .filter(
        (array_contains(col("name_toks"), "small") ||
          array_contains(col("type_toks"), "small")) &&
          array_contains(col("type_toks"), "economy"))
      .select(col("p_partkey"))
      .orderBy(col("p_partkey"))

  val ftsColSql: String =
    """SELECT p_partkey FROM (
      |  SELECT p_partkey,
      |    list_filter(string_split_regex(lower(p_name), '\W+'), t -> t <> '') AS name_toks,
      |    list_filter(string_split_regex(lower(p_type), '\W+'), t -> t <> '') AS type_toks
      |  FROM part
      |)
      |WHERE (list_contains(name_toks, 'small') OR list_contains(type_toks, 'small'))
      |  AND list_contains(type_toks, 'economy')
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------------
  // q_fts_anchor — FTS5 initial-token anchor (`MATCH '^spark'`): docs
  // whose FIRST token is the term. On the indexed path
  // (store/Fts.search) this is a first-position check on the pruned
  // postings (positions[0] = 0); here the same predicate over the
  // corpus as a leading-token regex — equivalent because the first
  // token is exactly the first \w+ run.
  def ftsAnchor(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .filter(lower(col("text")).rlike("^\\W*spark\\b"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  val ftsAnchorSql: String =
    """SELECT doc_id FROM documents
      |WHERE regexp_matches(lower(text), '^\W*spark\b')
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_fts_highlight — FTS5 highlight() auxiliary function
  // (fts5_aux.c; the reference's FTS5 tables expose it to Datasette's
  // search UI): matched docs with every query-term instance wrapped in
  // [ ] markers, case preserved, token-boundary matched. The Spark
  // side runs the native fts_highlight expression
  // (functions/FtsMark.scala — the same one Fts.searchHighlighted
  // applies on the indexed path); the oracle states identical
  // semantics as a word-boundary regexp_replace with backreference,
  // equivalent because tokens are exactly the \w+ runs on both
  // engines.
  def ftsHighlight(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .filter(
        lower(col("text")).rlike("\\bspark\\b") &&
          lower(col("text")).rlike("\\bvector\\b"))
      .select(col("doc_id"),
        graft.functions.FtsMark.ftsHighlight(
          spark, col("text"), Seq("spark", "vector")).as("highlighted"))
      .orderBy(col("doc_id"))

  val ftsHighlightSql: String =
    """SELECT doc_id,
      |  regexp_replace(text, '\b(spark|vector)\b', '[\1]', 'gi') AS highlighted
      |FROM documents
      |WHERE regexp_matches(lower(text), '\bspark\b')
      |  AND regexp_matches(lower(text), '\bvector\b')
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_vocab_df — vocabulary build: document frequency of every token,
  // top 25 (the seed statistics of a tokenizer/stopword pipeline).
  // array_distinct BEFORE explode keeps the shuffle at one row per
  // (doc, distinct token), and the top-k goes through a partial
  // TakeOrderedAndProject, not a global sort. The (df DESC, token)
  // order is total, so LIMIT is deterministic on both engines.
  def vocabDf(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(explode(array_distinct(Transforms.tokens(col("text")))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token"))
      .limit(25)

  val vocabDfSql: String =
    """SELECT token, COUNT(*) AS df
      |FROM (
      |  SELECT doc_id, unnest(list_distinct(list_filter(string_split_regex(lower(text), '\W+'), t -> t <> ''))) AS token
      |  FROM documents
      |)
      |GROUP BY token
      |ORDER BY df DESC, token
      |LIMIT 25""".stripMargin

  // ---------------------------------------------------------------------
  // q_token_count — LLM-pipeline text analysis: token counting
  // (whitespace/word-regex tokenizer) per document.
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(Transforms.tokens(col("text"))).cast("long").as("n_tokens"),
        length(col("text")).as("n_chars_actual"))
      .orderBy(col("doc_id"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  len(list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')) AS n_tokens,
      |  length(text) AS n_chars_actual
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_text_stats — quality scoring: per-doc length, token count, mean
  // token length, stopword ratio. Single-division doubles only (bit-
  // exact across engines; no multi-order float reductions).
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Transforms.tokens(col("text"))
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val stopHits =
      (length(padded) - length(replace(padded, lit(" the "), lit("")))) / lit(5)
    Catalog.table(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_actual"),
        size(toks).cast("long").as("n_tokens"),
        (length(col("text")).cast("double") / size(toks).cast("double"))
          .as("chars_per_token"),
        (stopHits.cast("double") / size(toks).cast("double"))
          .as("stopword_ratio"))
      .orderBy(col("doc_id"))
  }

  val textStatsSql: String =
    """SELECT doc_id,
      |  length(text) AS n_chars_actual,
      |  len(list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')) AS n_tokens,
      |  CAST(length(text) AS DOUBLE) / CAST(len(list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')) AS DOUBLE) AS chars_per_token,
      |  CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' the ', ''))) // 5 AS DOUBLE)
      |    / CAST(len(list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')) AS DOUBLE) AS stopword_ratio
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_quality_filter — Gopher-style document quality gating (Rae et
  // al. 2021 §A1.1 heuristics re-expressed): each doc gets its FIRST
  // failing rule (too short / implausible mean word length / no
  // stopwords) or 'keep', aggregated to a per-reason census — the
  // admission-control stage of a training-data pipeline. Pure column
  // math, one codegen'd projection + one partial-agg'd groupBy; rule
  // order is the CASE order on both engines, and the only double
  // (mean token length) is a single integer-sum division → bit-exact.
  private val qfStopwords = Seq(
    "the", "be", "to", "of", "and", "that", "have", "with")

  /** The gate's per-doc verdict over a `text` column — ONE definition
    * of the rules, shared by the census query and the composed
    * pipeline (PipelineOps). First failing rule or 'keep'.
    */
  private[queries] def qualityReason: Column = {
    val toks = Transforms.tokens(col("text"))
    val nTok = size(toks)
    val charSum = aggregate(toks, lit(0), (a, t) => a + length(t))
    val meanLen = charSum.cast("double") / nTok.cast("double")
    val stopHits = size(array_intersect(toks, typedLit(qfStopwords)))
    when(length(col("text")) < 200 || nTok < 10, "too_short")
      .when(meanLen < 3.0 || meanLen > 10.0, "word_length")
      .when(stopHits < 2, "no_stopwords")
      .otherwise("keep")
  }

  /** The same verdict in DuckDB SQL, with `text` in scope. */
  private[queries] val qualityReasonSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    val stops = qfStopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""CASE
       |    WHEN length(text) < 200 OR len(toks) < 10 THEN 'too_short'
       |    WHEN CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum') AS DOUBLE)
       |         / CAST(len(toks) AS DOUBLE) < 3.0
       |      OR CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum') AS DOUBLE)
       |         / CAST(len(toks) AS DOUBLE) > 10.0 THEN 'word_length'
       |    WHEN len(list_intersect(toks, $stops)) < 2 THEN 'no_stopwords'
       |    ELSE 'keep' END""".stripMargin
  }

  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame = {
    Catalog.table(spark, sfDir, "documents")
      .select(qualityReason.as("reason"))
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("reason"))
  }

  val qualityFilterSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    s"""SELECT reason, COUNT(*) AS n
       |FROM (
       |  SELECT $qualityReasonSql AS reason
       |  FROM (SELECT text, $toks AS toks FROM documents)
       |)
       |GROUP BY reason
       |ORDER BY reason""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_quality_classifier — a TRAINED linear quality scorer, the
  // weak-label bootstrap real pipelines run (CCNet / GPT-3's quality
  // filter: heuristic labels -> train a cheap classifier -> it
  // generalizes past the rules): the LENGTH gate provides the weak
  // labels (+1 = passes `length >= 200 AND >= 10 tokens`, -1
  // otherwise — the FULL Gopher gate labels this synthetic corpus
  // single-class, which trains nothing; the length rule splits it
  // ~70/30), features are 256-bucket HASHED bag-of-words counts
  // (md5-bucketed, the fasttext hashing trick at toy width), and the
  // model is a NEAREST-CENTROID discriminant (Rocchio 1971):
  // classify x positive iff it is L2-closer to the positive class
  // centroid — the midpoint rule  2·x·(µ+−µ−) > ‖µ+‖² − ‖µ−‖².
  // Nearest-centroid, not perceptron/logistic, deliberately: the
  // batch perceptron OSCILLATES on this non-separable data (measured:
  // it never beats the majority class), and a sigmoid would drag
  // exp() in, which is not bit-stable across engines (the bigram LM's
  // linear-probability reasoning above). The centroid rule trains in
  // ONE pass, is immune to class imbalance, and — multiplied through
  // by (A·B)², A = #neg docs, B = #pos docs — is INTEGER-exact:
  //   W_b = A·S+_b − B·S−_b                (scaled µ+ − µ−)
  //   keep(x)  ⇔  2AB·(x·W)  >  Σ_b (A·S+_b + B·S−_b)·W_b
  // with S± the per-bucket class count sums. Measured on testdata:
  // 0.89 accuracy vs 0.70 majority — the classifier genuinely
  // generalizes the gate from token-distribution evidence alone.
  //
  // Shape at scale: one tokenize+explode pass -> per-(doc, bucket)
  // partial-agg'd counts; the model is 256 rows (broadcast), the
  // threshold ONE scalar (broadcast); scoring is a broadcast join +
  // per-doc sum — nothing shuffles wider than the count aggregation.
  // The final scalar products pass 2^63 around 10^9 corpus tokens, so
  // they run in DECIMAL(38,0) — integer-exact to 38 digits, good past
  // 10^15 tokens (DuckDB's SUM promotes to INT128 on its own).
  /** ONE definition of the hashed feature bucket (over a `token`
    * column) — shared by the batch oracle op and the streaming
    * incremental model (streaming/StreamCentroid).
    */
  private[graft] def featBucket: Column =
    conv(substring(md5(col("token")), 1, 2), 16, 10).cast("int")

  /** ONE definition of the weak-label rule (+1 = passes the length
    * gate) — shared by the batch op and the streaming sink.
    */
  private[graft] def lengthGateLabel(text: Column): Column =
    when(length(text) >= 200 && size(Transforms.tokens(text)) >= 10, 1)
      .otherwise(-1)

  /** The integer-exact nearest-centroid decision, factored so the
    * one-shot op and the streaming incrementally-maintained model
    * share a single scoring body. Inputs: per-(doc, bucket) counts,
    * per-bucket class sums (sp, sn), and the 1-row class doc counts
    * (b_pos, a_neg). Returns (doc_id, pred ∈ {1, −1}).
    */
  private[graft] def centroidPredict(
      feat: DataFrame, docIds: DataFrame,
      sums: DataFrame, counts: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val w = sums.crossJoin(broadcast(counts))
      .select(col("bucket"), col("sp"), col("sn"),
        col("a_neg"), col("b_pos"),
        (col("a_neg") * col("sp") - col("b_pos") * col("sn")).as("w"))
    val th = w.agg(
      sum((col("a_neg") * col("sp") + col("b_pos") * col("sn")).cast(dec) *
        col("w").cast(dec)).as("th"))
    val xw = feat.join(broadcast(w.select(col("bucket"), col("w"))), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * col("w")).as("xw"))
    val keep = (lit(2).cast(dec) * col("a_neg").cast(dec) *
      col("b_pos").cast(dec) * coalesce(col("xw"), lit(0L)).cast(dec)) >
      col("th")
    docIds.join(xw, Seq("doc_id"), "left")
      .crossJoin(broadcast(counts)).crossJoin(broadcast(th))
      .withColumn("pred", when(keep, 1).otherwise(-1))
  }

  def qualityClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    // examined r16: pinning lab/feat (each feeds 2-3 DAG branches)
    // measured 1.22x SLOWER on the interleaved A/B — with idle local
    // cores the duplicated branches execute in parallel for free,
    // while the pins serialize the critical path. Left lazy; at
    // cluster scale the duplicate passes are real cost, so this is a
    // candidate to revisit when the bench host is saturated.
    val docs = Catalog.table(spark, sfDir, "documents")
    val lab = docs.select(col("doc_id"),
      lengthGateLabel(col("text")).as("y"))
    val feat = docs
      .select(col("doc_id"), explode(Transforms.tokens(col("text"))).as("token"))
      .select(col("doc_id"), featBucket.as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val counts = lab.agg(
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("b_pos"),
      sum(when(col("y") === -1, 1L).otherwise(0L)).as("a_neg"))
    val sums = feat.join(lab, Seq("doc_id"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("y") === 1, col("cnt")).otherwise(0L)).as("sp"),
        sum(when(col("y") === -1, col("cnt")).otherwise(0L)).as("sn"))
    centroidPredict(feat, lab, sums, counts)
      .select(col("doc_id"), col("y").as("label_y"), col("pred"),
        when(col("pred") === col("y"), 1).otherwise(0).as("correct"))
      .orderBy(col("doc_id"))
  }

  val qualityClassifierSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    val bucket = "(strpos('0123456789abcdef', substr(md5(token), 1, 1)) - 1) * 16 + " +
      "strpos('0123456789abcdef', substr(md5(token), 2, 1)) - 1"
    s"""WITH lab AS (
       |  SELECT doc_id, CASE WHEN length(text) >= 200 AND len(toks) >= 10
       |    THEN 1 ELSE -1 END AS y
       |  FROM (SELECT doc_id, text, $toks AS toks FROM documents)
       |), feat AS (
       |  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT doc_id, CAST($bucket AS INT) AS bucket FROM (
       |      SELECT doc_id, unnest($toks) AS token FROM documents)
       |  ) GROUP BY doc_id, bucket
       |), cnts AS (
       |  SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b_pos,
       |         CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS a_neg
       |  FROM lab
       |), sums AS (
       |  SELECT bucket,
       |    CAST(SUM(CASE WHEN l.y = 1 THEN f.cnt ELSE 0 END) AS BIGINT) AS sp,
       |    CAST(SUM(CASE WHEN l.y = -1 THEN f.cnt ELSE 0 END) AS BIGINT) AS sn
       |  FROM feat f JOIN lab l USING (doc_id) GROUP BY bucket
       |), w AS (
       |  SELECT bucket, sp, sn, a_neg, b_pos,
       |    a_neg * sp - b_pos * sn AS w
       |  FROM sums CROSS JOIN cnts
       |), th AS (
       |  SELECT SUM(CAST(a_neg * sp + b_pos * sn AS HUGEINT)
       |             * CAST(w AS HUGEINT)) AS th
       |  FROM w
       |), xw AS (
       |  SELECT f.doc_id, CAST(SUM(f.cnt * w.w) AS BIGINT) AS xw
       |  FROM feat f JOIN w USING (bucket) GROUP BY f.doc_id
       |)
       |SELECT l.doc_id, l.y AS label_y,
       |  CASE WHEN CAST(2 AS HUGEINT) * a_neg * b_pos * COALESCE(xw.xw, 0)
       |         > th.th THEN 1 ELSE -1 END AS pred,
       |  CASE WHEN (CAST(2 AS HUGEINT) * a_neg * b_pos * COALESCE(xw.xw, 0)
       |         > th.th) = (l.y = 1) THEN 1 ELSE 0 END AS correct
       |FROM lab l LEFT JOIN xw USING (doc_id)
       |CROSS JOIN cnts CROSS JOIN th
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_repetition — Gopher-style repetition signal: the fraction of
  // duplicate word-3-grams within each document (boilerplate and
  // looping generations score high). Reuses the dedup shingle
  // machinery; ratio = 1 - distinct/total is one exact subtraction on
  // a single-division double → bit-exact across engines.
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    // native one-pass expression (graft.functions.TrigramStats): the
    // declarative shingle chain runs interpreted and measured ~4 s at
    // sf0.1 vs ~0.3 s for the native loop — same oracle semantics.
    // array(...) + lambda binding force one eval per row and turn the
    // null (short-doc) case into explode-drop.
    val stats = graft.functions.TrigramStats.trigramStats(spark, col("text"))
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(filter(array(stats), s => s.isNotNull)).as("r"))
      .select(col("doc_id"), col("r.n_trigrams").as("n_trigrams"),
        col("r.dup_ratio").as("dup_ratio"))
      .orderBy(col("doc_id"))
  }

  val repetitionSql: String =
    """SELECT doc_id, len(sh) AS n_trigrams,
      |  1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / CAST(len(sh) AS DOUBLE) AS dup_ratio
      |FROM (
      |  SELECT doc_id,
      |    list_transform(range(0, greatest(len(toks) - 2, 0)),
      |      j -> array_to_string(toks[j+1:j+3], ' ')) AS sh
      |  FROM (
      |    SELECT doc_id,
      |      list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '') AS toks
      |    FROM documents)
      |)
      |WHERE len(sh) > 0
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_pii_scan — PII detection census (the scrub stage's dry run):
  // per source, how many docs match email / phone / URL patterns and
  // the total match count. Patterns restricted to syntax Java regex
  // and RE2 interpret identically; counts are COUNT/len ints (SUM
  // cast to BIGINT on the oracle side — DuckDB widens integer SUMs).
  private val piiPatterns = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\+?[0-9][0-9 -]{7,}[0-9]",
    "url" -> "https?://[^ ]+")

  def piiScan(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = piiPatterns.map { case (kind, p) =>
      size(regexp_extract_all(col("text"), lit(p), lit(0))).as(s"n_$kind")
    }
    Catalog.table(spark, sfDir, "documents")
      .select(col("source") +: counts: _*)
      .groupBy(col("source"))
      .agg(
        count(when(piiPatterns.map(p => col(s"n_${p._1}") > 0)
          .reduce(_ || _), 1)).as("n_docs_with_pii"),
        piiPatterns.map { case (kind, _) =>
          sum(col(s"n_$kind")).as(s"total_$kind")
        }: _*)
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------------
  // q_scrub_mask — the scrub stage itself (q_pii_scan is its dry run):
  // replace every match of an ordered pattern list with a typed
  // placeholder — the PII set (email → phone → URL: the email pass
  // removes digits a phone pattern could partially re-match, and a URL
  // embedding an email redacts consistently inner-first) plus a
  // blocklisted-entity mask (`\b(customer|supplier)\b` → <ENTITY>, the
  // anonymize-named-entities form; also what exercises the chain on
  // this corpus, whose synthetic text carries no literal PII). Emits
  // only the docs the scrub CHANGED — at corpus scale the untouched
  // majority is pure pass-through and needs no rewrite. Pure
  // regexp_replace chain: codegen'd, map-only, no shuffle before the
  // presentation sort. Patterns stay in the Java∩RE2 common syntax
  // (\b is ASCII word-boundary in both).
  private val scrubPatterns = piiPatterns.map { case (kind, p) =>
    (p, s"<${kind.toUpperCase(java.util.Locale.ROOT)}>")
  } :+ ("\\b(customer|supplier)\\b" -> "<ENTITY>")

  /** The scrub chain as a reusable Column / DuckDB expression — the
    * release pipeline (PipelineOps.corpusRelease) runs the SAME chain
    * as its first stage, one definition.
    */
  private[queries] def scrubbedText(c: Column): Column =
    scrubPatterns.foldLeft(c) {
      case (x, (p, token)) => regexp_replace(x, p, token)
    }

  private[queries] def scrubChainSql(inner: String): String =
    scrubPatterns.foldLeft(inner) { case (expr, (p, token)) =>
      s"regexp_replace($expr, '$p', '$token', 'g')"
    }

  def scrubMask(spark: SparkSession, sfDir: String): DataFrame = {
    val masked = scrubbedText(col("text"))
    Catalog.table(spark, sfDir, "documents")
      .withColumn("masked_text", masked)
      .filter(col("masked_text") =!= col("text"))
      .select(col("doc_id"), col("masked_text"))
      .orderBy(col("doc_id"))
  }

  val scrubMaskSql: String = {
    // DuckDB replaces only the FIRST match without the 'g' flag (the
    // documented parity gotcha); Spark's regexp_replace is global
    val chain = scrubChainSql("text")
    s"""SELECT doc_id, masked_text FROM (
       |  SELECT doc_id, text, $chain AS masked_text FROM documents)
       |WHERE masked_text <> text
       |ORDER BY doc_id""".stripMargin
  }

  val piiScanSql: String = {
    val exprs = piiPatterns.map { case (kind, p) =>
      s"len(regexp_extract_all(text, '$p')) AS n_$kind"
    }.mkString(", ")
    val anyPii = piiPatterns.map(p => s"n_${p._1} > 0").mkString(" OR ")
    val sums = piiPatterns.map { case (kind, _) =>
      s"CAST(SUM(n_$kind) AS BIGINT) AS total_$kind"
    }.mkString(", ")
    s"""SELECT source,
       |  COUNT(CASE WHEN $anyPii THEN 1 END) AS n_docs_with_pii, $sums
       |FROM (SELECT source, $exprs FROM documents)
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_bpe_step — the first iteration of BPE vocabulary training
  // (store/Bpe), oracle-checked: word counts (one corpus groupBy),
  // initial character symbols, adjacent-pair counts weighted by word
  // frequency, top-10 pairs. The same relationship q_kmeans_step has
  // to the k-means loop: the ITERATED step verified bit-exact against
  // an independent engine, while BpeSpec checks the full training
  // loop against a reference implementation (an iterative algorithm
  // is not reasonably expressible as one DuckDB query). Order fully
  // pinned (cnt DESC, a, b) so LIMIT is deterministic on both sides.
  def bpeStep(spark: SparkSession, sfDir: String): DataFrame = {
    val words = Catalog.table(spark, sfDir, "documents")
      .select(explode(Transforms.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    words.filter(length(col("word")) >= 2)
      .select(col("n"), explode(transform(
        sequence(lit(0), length(col("word")) - 2),
        j => struct(col("word").substr(j + 1, lit(1)).as("a"),
          col("word").substr(j + 2, lit(1)).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(10)
  }

  // ---------------------------------------------------------------------
  // q_bpe_apply — the BPE ENCODER (store/Bpe.applyMerges) verified
  // end-to-end against an independent engine. The merge list is a
  // FIXED constant (no training at plan-construction time — the frame
  // stays lazy, unlike a train()-at-construction design), rank-ordered
  // and deliberately CASCADING: merge 1 ("th"+"e") consumes merge 0's
  // output symbol, so rank order is load-bearing. Encoding runs over
  // the DISTINCT word vocabulary (the production shape: encode |V|
  // words once, broadcast the result), not the corpus stream. DuckDB
  // replicates the greedy left-to-right fold exactly: each merge is a
  // list_reduce over single-element lists with the same
  // merge-last-or-append step Bpe.mergePair folds with.
  private val bpeFixedMerges: Seq[graft.store.Bpe.Merge] = Seq(
    graft.store.Bpe.Merge(0, "t", "h", 0L),
    graft.store.Bpe.Merge(1, "th", "e", 0L),
    graft.store.Bpe.Merge(2, "i", "n", 0L),
    graft.store.Bpe.Merge(3, "a", "n", 0L),
    graft.store.Bpe.Merge(4, "e", "r", 0L))

  def bpeApply(spark: SparkSession, sfDir: String): DataFrame = {
    val words = graft.store.Bpe.wordCounts(
      Catalog.table(spark, sfDir, "documents"), "text")
    words
      .select(col("word"), col("n"),
        graft.store.Bpe.applyMerges(col("word"), bpeFixedMerges).as("s"))
      .select(col("word"), col("n"),
        array_join(col("s"), "|").as("syms"),
        size(col("s")).cast("long").as("n_syms"))
      .orderBy(col("n").desc, col("word"))
      .limit(500)
  }

  val bpeApplySql: String = {
    // one greedy merge pass: wrap each symbol in a singleton list so
    // the reduce accumulator is list<string>, then merge-last-or-append
    def merge(s: String, a: String, b: String): String =
      s"""list_reduce(list_transform($s, x -> [x]),
         |    (acc, x) -> CASE WHEN acc[len(acc)] = '$a' AND x[1] = '$b'
         |      THEN acc[1:len(acc)-1] || ['$a$b'] ELSE acc || x END)""".stripMargin
    s"""WITH words AS (
       |  SELECT word, COUNT(*) AS n FROM (
       |    SELECT unnest(list_filter(string_split_regex(lower(text), '\\W+'),
       |      t -> t <> '')) AS word
       |    FROM documents) GROUP BY word
       |), s0 AS (
       |  SELECT word, n,
       |    list_transform(range(1, len(word) + 1), i -> word[i:i]) AS s
       |  FROM words
       |), s1 AS (SELECT word, n, ${merge("s", "t", "h")} AS s FROM s0
       |), s2 AS (SELECT word, n, ${merge("s", "th", "e")} AS s FROM s1
       |), s3 AS (SELECT word, n, ${merge("s", "i", "n")} AS s FROM s2
       |), s4 AS (SELECT word, n, ${merge("s", "a", "n")} AS s FROM s3
       |), s5 AS (SELECT word, n, ${merge("s", "e", "r")} AS s FROM s4)
       |SELECT word, n, array_to_string(s, '|') AS syms, len(s) AS n_syms
       |FROM s5
       |ORDER BY n DESC, word
       |LIMIT 500""".stripMargin
  }

  val bpeStepSql: String =
    """WITH words AS (
      |  SELECT word, COUNT(*) AS n FROM (
      |    SELECT unnest(list_filter(string_split_regex(lower(text), '\W+'),
      |      t -> t <> '')) AS word
      |    FROM documents) GROUP BY word
      |), pairs AS (
      |  SELECT n, unnest(list_transform(range(0, len(word) - 1),
      |    j -> struct_pack(a := word[j+1:j+1], b := word[j+2:j+2]))) AS p
      |  FROM words WHERE len(word) >= 2
      |)
      |SELECT p.a AS a, p.b AS b, CAST(SUM(n) AS BIGINT) AS cnt
      |FROM pairs GROUP BY p.a, p.b
      |ORDER BY cnt DESC, a, b
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------------
  // q_substring_match — the BOOLEAN substring-MATCH surface (FTS5
  // `tokenize='trigram'` + MATCH: store/Trigram.matchSearch): each
  // needle is independently trigram-pruned and exactly verified (the
  // q_substring_search kernel), then the boolean algebra runs on
  // verified pk sets — OR = union, NOT = anti-join — so composition
  // adds no approximation. The oracle sees only the semantics:
  // (contains a OR contains b) AND NOT contains c.
  private val matchNeedleA = "sort table"
  private val matchNeedleB = "filter rows"
  private val matchNeedleC = "partition"

  def substringMatch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val needles = Seq(matchNeedleA, matchNeedleB, matchNeedleC)
      .map(_.toLowerCase(java.util.Locale.ROOT))
    val docs = Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), lower(col("text")).as("t"))
    // ONE corpus gram pass amortized across every needle in the
    // boolean query (the batched-lookup production shape — a per-
    // needle pass would re-explode the corpus once per term): the
    // broadcast side tags each gram with its needle id, per-(doc,
    // needle) hit counts check all-grams-present, contains() verifies
    // each surviving candidate against ITS needle, and the boolean
    // combination collapses to predicates over each doc's verified
    // needle-id set — no per-needle joins at all.
    val gramTable = needles.zipWithIndex.flatMap { case (n, i) =>
      n.sliding(3).toSeq.distinct.map(g => (g, i))
    }.toDF("g", "nid")
    val kOf = element_at(
      array(needles.map(n => lit(n.sliding(3).toSeq.distinct.length)): _*),
      col("nid") + 1)
    val needleOf = element_at(
      array(needles.map(lit): _*), col("nid") + 1)
    val grams = docs.filter(length(col("t")) >= 3)
      .select(col("doc_id"), explode(
        graft.functions.CharGrams.charGrams(spark, col("t"), 3)).as("g"))
    val verified = grams
      .join(broadcast(gramTable), Seq("g"))
      .groupBy(col("doc_id"), col("nid"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") === kOf)
      .join(docs, Seq("doc_id"))
      .filter(col("t").contains(needleOf))
    verified
      .groupBy(col("doc_id"))
      .agg(collect_set(col("nid")).as("nids"))
      .filter((array_contains(col("nids"), 0) ||
        array_contains(col("nids"), 1)) &&
        !array_contains(col("nids"), 2))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val substringMatchSql: String = {
    def c(n: String) = s"contains(lower(text), '${n.toLowerCase}')"
    s"""SELECT doc_id FROM documents
       |WHERE (${c(matchNeedleA)} OR ${c(matchNeedleB)})
       |  AND NOT ${c(matchNeedleC)}
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_lm_bigram_score — CCNet-style language-model quality scoring
  // (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  // Datasets from Web Crawl Data"): train a bigram model ON the corpus
  // (two partial-agg'd count groupBys — the model artifacts, persisted
  // tables at 100 TB), then score every document by its mean smoothed
  // transition probability p(w_i | w_{i-1}) = (c(w_{i-1}w_i) + 1) /
  // (c(w_{i-1}) + V), add-one smoothing, V = corpus vocab.
  //
  // CCNet ranks by log-perplexity; the scoring kernel here sums LINEAR
  // probabilities quantized to 1e-6 longs instead, because ln() is not
  // IEEE-pinned (JVM StrictMath vs DuckDB libm can differ in the last
  // ulp, flipping a floor at a quantization boundary), while
  // floor(1e6 · (a/b)) over exact-integer-valued doubles is a single
  // IEEE division + multiply — bit-stable on both engines. The
  // induced ordering is the same "how expected is this text under the
  // corpus model" signal the quality filter consumes; swapping ln()
  // in is a one-expression change where a cross-engine bit-match
  // isn't demanded. Output stays integer-exact (n_trans, score_q);
  // the mean is the caller's single division.
  //
  // Scale shape: scoring is per-position equi-joins on (prev, cur)
  // and prev — a hot bigram ("of the") is a hot JOIN key (AQE skew
  // split), never a row explosion beyond |tokens|; the broadcast
  // vocab scalar is one row.
  def lmBigramScore(spark: SparkSession, sfDir: String): DataFrame = {
    // transitions as native word-bigrams (functions/WordGrams) split
    // back into (prev, cur) by codegen'd substring_index — tokens
    // contain no spaces, so the round-trip is lossless. The frame
    // stays LAZY across its three consumers: each recompute is one
    // cheap native corpus pass, where pinning the per-token
    // transition stream would checkpoint a corpus-sized frame (the
    // old interpreted HOF chain was worth pinning; this is not)
    val docs = Catalog.table(spark, sfDir, "documents")
    val trans = docs
      .select(col("doc_id"), explode(graft.functions.WordGrams.wordGrams(
        spark, col("text"), 2, distinct = false)).as("bg"))
      .select(col("doc_id"),
        substring_index(col("bg"), " ", 1).as("prev"),
        substring_index(col("bg"), " ", -1).as("cur"))
    val big = trans.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c2"))
    val uni = trans.groupBy(col("prev")).agg(count(lit(1)).as("c1"))
    val vocab = docs
      .select(explode(graft.functions.WordGrams.wordGrams(
        spark, col("text"), 1, distinct = false)).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    // occurrence-stream join (trans ⋈ big ⋈ uni): a pre-collapse to
    // per-doc (prev, cur) multiplicities before the probability join
    // MEASURED 45% slower at sf0.1 — the extra shuffle outweighs the
    // join-width saving when docs are short (distinct ≈ occurrences)
    trans.join(big, Seq("prev", "cur")).join(uni, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor((col("c2") + lit(1)).cast("double") /
          (col("c1") + col("v")).cast("double") * lit(1e6)).as("pq"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"), sum(col("pq")).as("score_q"))
      .orderBy(col("doc_id"))
  }

  val lmBigramScoreSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '') AS toks
      |  FROM documents
      |), trans AS (
      |  SELECT doc_id, t.prev AS prev, t.cur AS cur FROM (
      |    SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
      |      j -> struct_pack(prev := toks[j+1], cur := toks[j+2]))) AS t
      |    FROM toks WHERE len(toks) >= 2)
      |), big AS (
      |  SELECT prev, cur, COUNT(*) AS c2 FROM trans GROUP BY prev, cur
      |), uni AS (
      |  SELECT prev, COUNT(*) AS c1 FROM trans GROUP BY prev
      |), vocab AS (
      |  SELECT COUNT(DISTINCT tok) AS v
      |  FROM (SELECT unnest(toks) AS tok FROM toks)
      |), scored AS (
      |  SELECT tr.doc_id,
      |    CAST(floor(CAST(b.c2 + 1 AS DOUBLE) / CAST(u.c1 + v.v AS DOUBLE) * 1e6) AS BIGINT) AS pq
      |  FROM trans tr
      |  JOIN big b ON tr.prev = b.prev AND tr.cur = b.cur
      |  JOIN uni u ON tr.prev = u.prev
      |  CROSS JOIN vocab v
      |)
      |SELECT doc_id, COUNT(*) AS n_trans, CAST(SUM(pq) AS BIGINT) AS score_q
      |FROM scored GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_tfidf — per-document salient terms: top-3 by tf·idf, the
  // keyword-extraction primitive (and the bag-of-words feature
  // builder a retrieval/labeling pipeline runs next to BM25, which
  // q_fts_ranked already covers corpus-side). Scoring uses the
  // LINEAR-idf variant tf·(N/df) with the ratio as EXACT integer
  // division, score_q = tf · (1000000·N div df): ln() is not
  // IEEE-pinned across engines (the q_lm_bigram_score lesson), while
  // bigint division is bit-exact everywhere and induces the same
  // rare-term-weighted ranking family. Shape: one tokenize+explode
  // pass → (doc, term, tf) partial agg; df is a COUNT(*) window over
  // the term partition of the SAME aggregated rows (one corpus pass,
  // one term exchange — not the self-join that re-tokenized the
  // corpus); the scalar N broadcasts; top-3 per doc is a per-doc
  // window (InferWindowGroupLimit ships only local top-3 through the
  // exchange). Ties pin on term ASC.
  def tfidf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Catalog.table(spark, sfDir, "documents")
    // (doc, term, tf) feeds df AND the scoring join; kept LAZY — the
    // recompute is one cheap tokenize+partial-agg pass, and an eager
    // pin here would run corpus jobs at CONSTRUCTION time (the
    // contract every other Op keeps for plan audits / Inventory
    // iteration)
    val tf = docs
      .select(col("doc_id"), explode(Transforms.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df = docs-per-term = COUNT(*) over the term partition of tf's
    // (doc, term) rows: same value the former `tf.groupBy(term)` +
    // self-join produced, but Spark has no common-subexpression reuse
    // across DAG branches, so the join form tokenized and aggregated
    // the corpus TWICE (two full scan+explode jobs, plan-verified).
    // The window form computes tf once and reuses the term exchange
    // the join needed anyway (guide §2.4: operations keyed the same
    // way share one shuffle).
    val n = docs.agg(count(lit(1)).as("n"))
    tf.withColumn("df", count(lit(1)).over(
        Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf") * expr("(1000000L * n) div df")).as("score_q"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score_q").desc, col("term"))).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
        col("score_q"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val tfidfSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    s"""WITH tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM (
       |    SELECT doc_id, unnest($toks) AS term FROM documents)
       |  GROUP BY doc_id, term
       |), df AS (
       |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
       |), n AS (
       |  SELECT COUNT(*) AS n FROM documents
       |), scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    tf.tf * ((1000000 * n.n) // df.df) AS score_q
       |  FROM tf JOIN df USING (term) CROSS JOIN n
       |)
       |SELECT doc_id, rnk, term, tf, df, score_q FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY score_q DESC, term) AS BIGINT) AS rnk
       |  FROM scored)
       |WHERE rnk <= 3
       |ORDER BY doc_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_heavy_hitters — frequent terms via the Misra-Gries sketch
  // (functions/MgCounters, the mergeable-summaries combine): pass 1
  // reduces the token stream to ≤ k bounded counters per partition
  // (map-side partials; k pairs cross the exchange, never the
  // stream), pass 2 re-counts ONLY the ≤ k candidates exactly and
  // keeps those above the guarantee threshold N/(k+1). The sketch's
  // internal counters are partition-order-dependent, but its
  // guarantee — every item with true count > N/(k+1) survives — makes
  // the thresholded, exactly-verified output IDENTICAL to a full
  // exact groupBy on any cluster shape, which is precisely what the
  // oracle computes (and MgSpec asserts on a skewed corpus under
  // adversarial repartitioning). Threshold uses bigint division —
  // exact on both engines.
  private val mgK = 64

  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Catalog.table(spark, sfDir, "documents")
      .select(explode(Transforms.tokens(col("text"))).as("term"))
    val sketch = toks.agg(count(lit(1)).as("n"),
      graft.functions.MgCounters.mgCounters(spark, col("term"), mgK)
        .as("cands"))
    val cands = sketch.select(col("n"), explode(col("cands")).as("term"))
    toks.join(broadcast(cands), Seq("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"), first(col("n")).as("n"))
      .filter(col("cnt") > expr(s"n div ${mgK + 1}"))
      .select(col("term"), col("cnt"))
      .orderBy(col("cnt").desc, col("term"))
  }

  val heavyHittersSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    s"""WITH t AS (
       |  SELECT unnest($toks) AS term FROM documents
       |), n AS (
       |  SELECT COUNT(*) AS n FROM t
       |)
       |SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
       |FROM t CROSS JOIN n
       |GROUP BY term, n.n
       |HAVING COUNT(*) > n.n // ${mgK + 1}
       |ORDER BY cnt DESC, term""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_langid — marker-token language scoring (n-gram-heuristic
  // language ID): count language-marker occurrences via the padded
  // replace-length trick, argmax with fixed precedence. The engine
  // design point is that scoring is pure column math (no UDF) and the
  // marker table is a literal — at 100 TB this is one codegen'd
  // projection.
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a "),
    "es" -> Seq(" el ", " la "),
    "de" -> Seq(" der ", " und "),
    "fr" -> Seq(" le ", " et "))

  private def markerScore(padded: Column, markers: Seq[String]): Column =
    markers.map { m =>
      (length(padded) - length(replace(padded, lit(m), lit("")))) / lit(m.length)
    }.reduce(_ + _)

  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val scores = langMarkers.map { case (lang, ms) =>
      lang -> markerScore(padded, ms)
    }
    // argmax with precedence = declaration order; all-zero → "und"
    val best = scores.foldRight(lit("und")) { case ((lang, s), rest) =>
      val isMax = scores.map(_._2).map(o => s >= o).reduce(_ && _)
      when(s > 0 && isMax, lit(lang)).otherwise(rest)
    }
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang").as("declared_lang"),
        best.as("guessed_lang"))
      .groupBy(col("declared_lang"), col("guessed_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("declared_lang"), col("guessed_lang"))
  }

  val langIdSql: String = {
    def score(markers: Seq[String]): String =
      markers.map { m =>
        s"(length(padded) - length(replace(padded, '$m', ''))) // ${m.length}"
      }.mkString(" + ")
    val scoreDefs = langMarkers.map { case (lang, ms) =>
      s"${score(ms)} AS s_$lang"
    }.mkString(", ")
    val langs = langMarkers.map(_._1)
    val caseExpr = langMarkers.map { case (lang, _) =>
      val isMax = langs.map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN s_$lang > 0 AND $isMax THEN '$lang'"
    }.mkString(" ")
    s"""SELECT declared_lang, guessed_lang, COUNT(*) AS n
       |FROM (
       |  SELECT doc_id, lang AS declared_lang,
       |    CASE $caseExpr ELSE 'und' END AS guessed_lang
       |  FROM (
       |    SELECT doc_id, lang, $scoreDefs
       |    FROM (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS padded FROM documents)
       |  )
       |)
       |GROUP BY declared_lang, guessed_lang
       |ORDER BY declared_lang, guessed_lang""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_bpe_tokens — BPE-ish token counting: a GPT-2-style pre-tokenizer
  // regex (contractions, space-prefixed letter runs, digit runs,
  // punctuation runs) via regexp_extract_all; the distribution of
  // regex-token counts vs whitespace-token counts is the standard
  // proxy for tokenizer budget planning over a corpus.
  private val bpePattern =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  def bpeTokens(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(lower(col("text")), lit(bpePattern), lit(0)))
          .cast("long").as("n_bpe_tokens"),
        size(Transforms.tokens(col("text"))).cast("long").as("n_ws_tokens"))
      .orderBy(col("doc_id"))

  val bpeTokensSql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(lower(text), '${bpePattern.replace("'", "''")}')) AS n_bpe_tokens,
       |  len(list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')) AS n_ws_tokens
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_quantile_hist — distributed quantiles for threshold selection
  // ("keep the top 10% by score", "median length per language"): the
  // exact-sort answer is a global sort and the sketch answer
  // (GK/t-digest) is merge-order-dependent, so the 100 TB-correct
  // DETERMINISTIC shape is a fixed-width histogram: one partial-agg'd
  // groupBy((key, value div W)) over the corpus, then a cumulative
  // count over the per-key BUCKET rows (thousands per key, not the
  // corpus) finds the bucket holding each target quantile. The
  // reported threshold is the bucket's lower bound — resolution W,
  // exact rank semantics, identical on any partitioning (quantile
  // membership tests are pure integer arithmetic: cum·2 ≥ total is
  // p50, cum·10 ≥ 9·total is p90).
  private val histW = 64

  def quantileHist(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Catalog.table(spark, sfDir, "documents")
      .groupBy(col("lang"), floor(col("n_chars") / histW).as("b"))
      .agg(count(lit(1)).as("n"))
    val cum = hist.withColumn("cum",
      sum(col("n")).over(Window.partitionBy(col("lang")).orderBy(col("b"))))
      .withColumn("total",
        sum(col("n")).over(Window.partitionBy(col("lang"))))
    cum.groupBy(col("lang"))
      .agg(max(col("total")).as("n_docs"),
        (min(when(col("cum") * 2 >= col("total"), col("b"))) * histW)
          .as("p50_lo"),
        (min(when(col("cum") * 10 >= col("total") * 9, col("b"))) * histW)
          .as("p90_lo"))
      .orderBy(col("lang"))
  }

  val quantileHistSql: String =
    s"""WITH hist AS (
       |  SELECT lang, CAST(floor(n_chars / $histW) AS BIGINT) AS b, COUNT(*) AS n
       |  FROM documents GROUP BY 1, 2
       |), cum AS (
       |  SELECT lang, b, n,
       |    SUM(n) OVER (PARTITION BY lang ORDER BY b) AS cum,
       |    SUM(n) OVER (PARTITION BY lang) AS total
       |  FROM hist
       |)
       |SELECT lang, CAST(MAX(total) AS BIGINT) AS n_docs,
       |  CAST(MIN(CASE WHEN cum * 2 >= total THEN b END) * $histW AS BIGINT) AS p50_lo,
       |  CAST(MIN(CASE WHEN cum * 10 >= total * 9 THEN b END) * $histW AS BIGINT) AS p90_lo
       |FROM cum
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q_winsorize — robust scaling for quality features: clamp a value
  // column to its per-group [p10, p90] band (the outlier treatment a
  // score pipeline applies before normalizing), with thresholds from
  // the SAME deterministic histogram-quantile machinery as
  // q_quantile_hist (fixed-width buckets + integer rank tests — no
  // global sort, no merge-order-dependent sketch, identical on any
  // partitioning). Two corpus passes: bucket-histogram partial agg →
  // per-group thresholds (a handful of rows, broadcast back), then a
  // row-local clamp. Clamped values quantize to 1e-6 longs BEFORE the
  // sum so the aggregate is exact integer arithmetic on both engines.
  private val winsorW = 8

  def winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Catalog.table(spark, sfDir, "events")
    val hist = ev
      .groupBy(col("event_type"), floor(col("value") / winsorW).as("b"))
      .agg(count(lit(1)).as("n"))
    val cum = hist.withColumn("cum",
      sum(col("n")).over(
        Window.partitionBy(col("event_type")).orderBy(col("b"))))
      .withColumn("total",
        sum(col("n")).over(Window.partitionBy(col("event_type"))))
    val thresholds = cum.groupBy(col("event_type"))
      .agg((min(when(col("cum") * 10 >= col("total"), col("b"))) * winsorW)
          .cast("double").as("lo"),
        (min(when(col("cum") * 10 >= col("total") * 9, col("b"))) * winsorW)
          .cast("double").as("hi"))
    ev.join(broadcast(thresholds), Seq("event_type"))
      .select(col("event_type"), col("value"), col("lo"), col("hi"),
        greatest(col("lo"), least(col("hi"), col("value"))).as("w"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        sum(floor(col("w") * 1e6).cast("long")).as("sum_q"))
      .orderBy(col("event_type"))
  }

  val winsorizeSql: String =
    s"""WITH hist AS (
       |  SELECT event_type, CAST(floor(value / $winsorW) AS BIGINT) AS b,
       |    COUNT(*) AS n
       |  FROM events GROUP BY 1, 2
       |), cum AS (
       |  SELECT event_type, b, n,
       |    SUM(n) OVER (PARTITION BY event_type ORDER BY b) AS cum,
       |    SUM(n) OVER (PARTITION BY event_type) AS total
       |  FROM hist
       |), thresholds AS (
       |  SELECT event_type,
       |    CAST(MIN(CASE WHEN cum * 10 >= total THEN b END) * $winsorW
       |      AS DOUBLE) AS lo,
       |    CAST(MIN(CASE WHEN cum * 10 >= total * 9 THEN b END) * $winsorW
       |      AS DOUBLE) AS hi
       |  FROM cum GROUP BY event_type
       |)
       |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(CASE WHEN e.value < t.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
       |  CAST(SUM(CASE WHEN e.value > t.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
       |  MIN(t.lo) AS lo, MIN(t.hi) AS hi,
       |  CAST(SUM(CAST(floor(greatest(t.lo, least(t.hi, e.value)) * 1e6)
       |    AS BIGINT)) AS BIGINT) AS sum_q
       |FROM events e JOIN thresholds t USING (event_type)
       |GROUP BY e.event_type
       |ORDER BY e.event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_substring_search — arbitrary-substring search, the FTS5
  // `trigram` tokenizer's job (fts5.c trigram tokenizer: LIKE/GLOB
  // acceleration; the reference's FTS tables use unicode61, but
  // trigram is the same MATCH machinery one tokenizer over): a raw
  // LIKE '%needle%' scan reads every byte of every document. The
  // trigram shape prunes first: a document can contain the needle
  // only if it contains ALL of the needle's character trigrams, so
  // explode each doc's distinct trigrams (at scale: the persisted
  // trigram postings table, maintained exactly like the word postings
  // in store/Fts), hash-join against the needle's trigram set, keep
  // docs matching all |needle|-2 of them (count equality — the same
  // AND-of-terms shape as Fts.search), and run the exact `contains`
  // verification only on those candidates. An in-row alternative
  // (array_intersect against the needle-gram literal, no explode, no
  // shuffle) MEASURED 1.6× SLOWER at sf0.1: three materialized array
  // passes per row lose to the codegen'd generator + broadcast hash
  // join, whose probe rejects non-needle grams without materializing
  // anything. Lowercased match mirrors FTS5 trigram's default case
  // folding.
  private val needle = "sort table window"

  def substringSearch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nGrams = needle.toLowerCase.sliding(3).toSeq.distinct
    val docs = Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), lower(col("text")).as("t"))
    // length guard: Spark's sequence(1, len-2) runs DESCENDING when
    // len < 3 (it would fabricate junk grams); DuckDB's range is just
    // empty there — and a short doc can't hold the needle anyway
    // per-row distinct-grams + join + count(*) MEASURED faster than
    // deduping after the probe (countDistinct's two-phase agg over
    // the multiplicity-inflated join output lost ~45% at sf0.1);
    // gram generation is the native CharGrams loop (the HOF chain it
    // replaces ran interpreted per element — 1.9 s of this query's
    // 2.7 s at sf0.1)
    val grams = docs.filter(length(col("t")) >= 3)
      .select(col("doc_id"), explode(
        graft.functions.CharGrams.charGrams(spark, col("t"), 3)).as("g"))
    val cands = grams
      .join(broadcast(nGrams.toDF("g")), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") === nGrams.length)
    docs.join(cands, Seq("doc_id"), "left_semi")
      .filter(col("t").contains(needle.toLowerCase))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val substringSearchSql: String = {
    val n = needle.toLowerCase
    val k = n.sliding(3).toSeq.distinct.length
    val gramList = n.sliding(3).toSeq.distinct
      .map(g => "'" + g.replace("'", "''") + "'").mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, lower(text) AS t FROM documents
       |), grams AS (
       |  SELECT doc_id, g FROM (
       |    SELECT doc_id, unnest(list_distinct(list_transform(
       |      range(1, len(t) - 1), i -> substr(t, CAST(i AS INT), 3)))) AS g
       |    FROM docs WHERE len(t) >= 3)
       |), cands AS (
       |  SELECT doc_id FROM grams
       |  WHERE g IN ($gramList)
       |  GROUP BY doc_id HAVING COUNT(*) = $k
       |)
       |SELECT d.doc_id FROM docs d
       |JOIN cands c ON d.doc_id = c.doc_id
       |WHERE contains(d.t, '${n.replace("'", "''")}')
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_vocab_coverage — out-of-vocabulary rate per source against a
  // fixed top-k vocabulary: the tokenizer-eval readout that decides
  // whether a vocab is big enough for a corpus slice (and the
  // mirror-image of q_vocab_df's document-frequency view). Vocab =
  // top-100 tokens by corpus frequency (ties alphabetical —
  // deterministic on both engines), planned as TakeOrderedAndProject
  // (per-partition heap, driver merge of 100 rows, no global sort);
  // coverage is then one broadcast left-join of the token stream
  // against the 100-row vocab and a per-source conditional count —
  // the token stream itself never shuffles. Coverage ratio is a
  // single division of exact longs → bit-identical.
  private val vocabTopK = 100

  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.store.Iteration.materialize
    // pinned: the token stream feeds the vocab build AND the coverage
    // count (tokenize once)
    val toks = materialize(Catalog.table(spark, sfDir, "documents")
      .select(col("source"), explode(Transforms.tokens(col("text"))).as("tok")))
    val vocab = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok"))
      .limit(vocabTopK)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        count(col("in_vocab")).as("n_covered"))
      .withColumn("coverage",
        col("n_covered").cast("double") / col("n_tokens").cast("double"))
      .orderBy(col("source"))
  }

  val vocabCoverageSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    s"""WITH t AS (
       |  SELECT source, unnest($toks) AS tok FROM documents
       |), vocab AS (
       |  SELECT tok FROM (
       |    SELECT tok, COUNT(*) AS c FROM t GROUP BY tok
       |    ORDER BY c DESC, tok LIMIT $vocabTopK)
       |)
       |SELECT source, COUNT(*) AS n_tokens,
       |  COUNT(CASE WHEN tok IN (SELECT tok FROM vocab) THEN 1 END) AS n_covered,
       |  CAST(COUNT(CASE WHEN tok IN (SELECT tok FROM vocab) THEN 1 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS coverage
       |FROM t
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_ngram_diversity — corpus-level lexical diversity per source:
  // distinct word-bigrams over total bigram occurrences (the
  // type/token ratio at n=2). Low ratios flag template/boilerplate
  // sources the way q_repetition flags repetitive DOCUMENTS — this is
  // the between-document complement. Shape: one bigram explode,
  // count + countDistinct per source (Spark plans the distinct as a
  // two-phase partial aggregate on (source, bigram) — group
  // cardinality crosses the exchange, not the token stream); ratio is
  // one exact-long division.
  def ngramDiversity(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(col("source"), explode(graft.functions.WordGrams.wordGrams(
        spark, col("text"), 2, distinct = false)).as("bg"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("bg")).as("n_distinct"))
      .withColumn("diversity",
        col("n_distinct").cast("double") / col("n_bigrams").cast("double"))
      .orderBy(col("source"))

  val ngramDiversitySql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    s"""WITH bg AS (
       |  SELECT source,
       |    unnest(list_transform(range(0, len(toks) - 1),
       |      j -> toks[j+1] || ' ' || toks[j+2])) AS bg
       |  FROM (SELECT source, $toks AS toks FROM documents)
       |  WHERE len(toks) >= 2
       |)
       |SELECT source, COUNT(*) AS n_bigrams,
       |  COUNT(DISTINCT bg) AS n_distinct,
       |  CAST(COUNT(DISTINCT bg) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS diversity
       |FROM bg
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  def ops: Seq[Op] = Seq(
    Op("q_substring_search", substringSearch, Some(substringSearchSql)),
    Op("q_substring_match", substringMatch, Some(substringMatchSql)),
    Op("q_vocab_coverage", vocabCoverage, Some(vocabCoverageSql)),
    Op("q_ngram_diversity", ngramDiversity, Some(ngramDiversitySql)),
    Op("q_quantile_hist", quantileHist, Some(quantileHistSql)),
    Op("q_bpe_tokens", bpeTokens, Some(bpeTokensSql)),
    Op("q_langid", langId, Some(langIdSql)),
    Op("q_ts_roundtrip", tsRoundtrip, Some(tsRoundtripSql)),
    Op("q_entity_expand", entityExpand, Some(entityExpandSql)),
    Op("q_source_extract", sourceExtract, Some(sourceExtractSql)),
    Op("q_html_unescape", htmlUnescape, Some(htmlUnescapeSql)),
    Op("q_json_extract", jsonExtract, Some(jsonExtractSql)),
    Op("q_fts_index", ftsIndex, Some(ftsIndexSql)),
    Op("q_fts_match", ftsMatch, Some(ftsMatchSql)),
    Op("q_fts_ranked", ftsRanked, Some(ftsRankedSql)),
    Op("q_fts_phrase", ftsPhrase, Some(ftsPhraseSql)),
    Op("q_fts_prefix", ftsPrefix, Some(ftsPrefixSql)),
    Op("q_fts_near", ftsNear, Some(ftsNearSql)),
    Op("q_fts_near_multi", ftsNearMulti, Some(ftsNearMultiSql)),
    Op("q_fts_bool", ftsBool, Some(ftsBoolSql)),
    Op("q_fts_col", ftsCol, Some(ftsColSql)),
    Op("q_fts_anchor", ftsAnchor, Some(ftsAnchorSql)),
    Op("q_fts_highlight", ftsHighlight, Some(ftsHighlightSql)),
    Op("q_vocab_df", vocabDf, Some(vocabDfSql)),
    Op("q_quality_filter", qualityFilter, Some(qualityFilterSql)),
    Op("q_quality_classifier", qualityClassifier, Some(qualityClassifierSql)),
    Op("q_repetition", repetition, Some(repetitionSql)),
    Op("q_pii_scan", piiScan, Some(piiScanSql)),
    Op("q_scrub_mask", scrubMask, Some(scrubMaskSql)),
    Op("q_token_count", tokenCount, Some(tokenCountSql)),
    Op("q_text_stats", textStats, Some(textStatsSql)),
    Op("q_lm_bigram_score", lmBigramScore, Some(lmBigramScoreSql)),
    Op("q_bpe_step", bpeStep, Some(bpeStepSql)),
    Op("q_bpe_apply", bpeApply, Some(bpeApplySql)),
    Op("q_tfidf", tfidf, Some(tfidfSql)),
    Op("q_heavy_hitters", heavyHitters, Some(heavyHittersSql)),
    Op("q_winsorize", winsorize, Some(winsorizeSql)))
}
