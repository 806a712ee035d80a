package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.Transforms

/** Large-scale training-data deduplication operators over `documents`
  * (BASELINE.json north-star extensions): exact dedup via normalized
  * content fingerprint, MinHash+LSH banding for near-dup candidate
  * generation, and blocked n-gram Jaccard verification.
  *
  * Scale design: every op is a hash-partition groupBy/self-join on a
  * derived key (fingerprint / band / block), never an all-pairs product
  * — at 100 TB the only quadratic step (Jaccard verify) runs strictly
  * within LSH/block buckets, which is the standard web-dedup shape.
  */
object DedupOps {

  /** Normalized exact-dup fingerprint: lowercase, collapse non-word
    * runs, md5. (The rolling-hash / document-fingerprint role from the
    * north-star list; md5 chosen because both engines implement it
    * identically for the oracle.)
    */
  private def fingerprint(text: Column): Column =
    Transforms.exactFingerprint(text)

  private val fingerprintSql =
    "md5(trim(regexp_replace(lower(text), '\\W+', ' ', 'g')))"

  // ---------------------------------------------------------------------
  // q_dedup_exact — exact dedup stats per source: map-side partial agg,
  // one shuffle on `source`.
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(col("source"), fingerprint(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_distinct"))
      .orderBy(col("source"))

  val dedupExactSql: String =
    s"""SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT $fingerprintSql) AS n_distinct
       |FROM documents
       |GROUP BY source
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q_dedup_keep_first — the dedup sink policy (keep lowest doc_id per
  // fingerprint = the reference's insert-or-ignore semantics, J5/K7,
  // applied to content identity): groupBy(fp).min.
  def dedupKeepFirst(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy(col("fp"))

  // ---------------------------------------------------------------------
  // q_dedup_keep_best — the QUALITY-aware keeper policy (what a real
  // corpus build uses instead of keep-first: among exact duplicates,
  // keep the copy the quality signal ranks highest — here the Gopher
  // length proxy n_chars desc, doc_id tiebreak; production plugs any
  // scored column into the same max_by). Same single map-side-partial
  // shuffle as keep-first — max_by aggregates without a window.
  def dedupKeepBest(spark: SparkSession, sfDir: String): DataFrame =
    keepBestOf(Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"), fingerprint(col("text")).as("fp")))

  /** The keeper aggregation over a pre-fingerprinted (doc_id, n_chars,
    * fp) frame — one map-side-partial shuffle, no window. Exposed so
    * the property spec can drive it over adversarial id domains.
    */
  private[queries] def keepBestOf(docs: DataFrame): DataFrame =
    docs.groupBy(col("fp"))
      .agg(
        // lexicographic struct key (n_chars dominant, lowest doc_id on
        // ties): struct ordering is field-by-field, so quality
        // dominance holds for ANY doc_id domain — an arithmetic
        // packing (n_chars*1e8 − doc_id) silently let billion-scale
        // ids flip the n_chars ordering
        max_by(col("doc_id"),
          struct(col("n_chars").cast("long").as("q"),
            (-col("doc_id")).cast("long").as("tie")))
          .as("keeper"),
        max(col("n_chars")).as("keeper_chars"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("fp"))

  // DuckDB's arg_max has no struct key, so the oracle packs the same
  // (n_chars, -doc_id) order into a 128-bit HUGEINT — n_chars*2^64 −
  // doc_id cannot flip for ANY int64 doc_id, unlike the old 1e8
  // packing. Deliberately a DIFFERENT exact formulation than Spark's
  // struct max_by: independent derivations make the parity check a
  // real oracle.
  val dedupKeepBestSql: String =
    s"""SELECT $fingerprintSql AS fp,
       |  arg_max(doc_id, CAST(n_chars AS HUGEINT)
       |    * CAST('18446744073709551616' AS HUGEINT) - doc_id) AS keeper,
       |  MAX(n_chars) AS keeper_chars,
       |  COUNT(*) AS n_copies
       |FROM documents
       |GROUP BY fp
       |ORDER BY fp""".stripMargin

  val dedupKeepFirstSql: String =
    s"""SELECT $fingerprintSql AS fp, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
       |FROM documents
       |GROUP BY fp
       |ORDER BY fp""".stripMargin

  // ---------------------------------------------------------------------
  // MinHash signatures: 4 hash functions over distinct word-3-gram
  // shingles, all derived from ONE md5 per shingle (four 8-hex-char
  // slices of the digest form four independent hash families) — 4× less
  // hashing than seeded re-hashing, the dominant cost at scale. 2
  // bands × 2 rows. All inside codegen via higher-order functions; no
  // shuffle until the band groupBy.
  private def withBands(spark: SparkSession, sfDir: String): DataFrame =
    bandsOf(spark, Catalog.table(spark, sfDir, "documents"))

  /** LSH band rows of an arbitrary (doc_id, text) corpus slice —
    * reused by the composed pipeline (PipelineOps), where banding runs
    * over the survivors of earlier stages, not the raw table.
    */
  private[queries] def bandsOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    // One native-expression pass per document (graft.functions
    // .MinHashSig): tokenize → shingle → md5 → 4 min-slices in a tight
    // loop. The declarative higher-order-function formulation (which
    // the DuckDB oracle SQL still spells out, bit-identically) runs
    // interpreted and re-evaluates captured subtrees per element —
    // measured 4.4s vs 0.15s at sf0.1. sig chars 1-16 = band0
    // (minhash slices 0,1), 17-32 = band1 (slices 2,3).
    import graft.functions.MinHashSig
    // array(sig) + lambda binding force exactly ONE signature eval per
    // row: a bare alias would be inlined by CollapseProject into every
    // reference (filter + 2 substrings = 3 evals).
    val sig = MinHashSig.minhashSig(spark, col("text"))
    val bandsArr = flatten(transform(
      filter(array(sig), s => s.isNotNull),
      s => MinHashSig.bandKeys(s, nHashes = 4, bands = 2)))
    docs
      .select(col("doc_id"), explode(bandsArr).as("b"))
      .select(col("doc_id"), col("b.band_idx").as("band_idx"),
        col("b.band").as("band"))
  }

  private val bandsCte: String = bandsCteOver("documents")

  /** The band CTE chain over an arbitrary source relation (must expose
    * doc_id, text) — `documents` for the standalone queries, a
    * survivor CTE for the composed pipeline.
    */
  private[queries] def bandsCteOver(src: String): String =
    s"""docs AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(0, greatest(len(toks) - 2, 0)),
      |      j -> array_to_string(toks[j+1:j+3], ' '))) AS sh
      |  FROM (
      |    SELECT doc_id,
      |      list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '') AS toks
      |    FROM $src)
      |), mh AS (
      |  SELECT doc_id,
      |    list_aggregate(list_transform(hs, h -> substr(h, 1, 8)), 'min') AS h0,
      |    list_aggregate(list_transform(hs, h -> substr(h, 9, 8)), 'min') AS h1,
      |    list_aggregate(list_transform(hs, h -> substr(h, 17, 8)), 'min') AS h2,
      |    list_aggregate(list_transform(hs, h -> substr(h, 25, 8)), 'min') AS h3
      |  FROM (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs
      |        FROM docs WHERE len(sh) > 0)
      |), bands AS (
      |  SELECT doc_id, 0 AS band_idx, h0 || h1 AS band FROM mh
      |  UNION ALL
      |  SELECT doc_id, 1 AS band_idx, h2 || h3 AS band FROM mh
      |)""".stripMargin

  // ---------------------------------------------------------------------
  // q_minhash_wide — the parameterized MinHash family at a wider
  // configuration (8 hashes × 4 bands, r=2), verified against an
  // independent engine: hashes 0-3 are the four 8-hex slices of
  // md5(shingle), hashes 4-7 the slices of the salted re-digest
  // md5("1|" + shingle) (functions/MinHashSig.scala:19-26 — '|' can't
  // occur in a \W+-split shingle, so salted inputs never collide with
  // unsalted ones). The oracle spells the identical family out in SQL,
  // which pins the salt convention — the S-curve spec (MinHashSigSpec)
  // checks banding MATH, this checks the HASH FAMILY cross-engine.
  // Production tunes (r, b) further (e.g. 128 hashes, r=8×b=16); the
  // plan shape is width-independent: one native-expression pass, band
  // explode, two partial-agg'd groupBys.
  def minhashWide(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.MinHashSig
    val sig = MinHashSig.minhashSig(spark, col("text"), shingleSize = 3, nHashes = 8)
    val bandsArr = flatten(transform(
      filter(array(sig), s => s.isNotNull),
      s => MinHashSig.bandKeys(s, nHashes = 8, bands = 4)))
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), explode(bandsArr).as("b"))
      .select(col("doc_id"), col("b.band_idx").as("band_idx"),
        col("b.band").as("band"))
      .groupBy(col("band_idx"), col("band"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("band_idx"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_docs"),
        max(col("n")).as("max_bucket"))
      .orderBy(col("band_idx"))
  }

  val minhashWideSql: String = {
    // h0-h3: slices of md5(s); h4-h7: slices of md5('1|' || s).
    val slices = (0 until 8).map { h =>
      val digest = if (h < 4) "md5(s)" else "md5('1|' || s)"
      s"    list_aggregate(list_transform(sh, s -> substr($digest, ${(h % 4) * 8 + 1}, 8)), 'min') AS h$h"
    }.mkString(",\n")
    val bandRows = (0 until 4).map { b =>
      s"  SELECT doc_id, $b AS band_idx, h${2 * b} || h${2 * b + 1} AS band FROM mh"
    }.mkString("\n  UNION ALL\n")
    s"""WITH docs AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(0, greatest(len(toks) - 2, 0)),
       |      j -> array_to_string(toks[j+1:j+3], ' '))) AS sh
       |  FROM (
       |    SELECT doc_id,
       |      list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '') AS toks
       |    FROM documents)
       |), mh AS (
       |  SELECT doc_id,
       |$slices
       |  FROM docs WHERE len(sh) > 0
       |), bands AS (
       |$bandRows
       |), buckets AS (
       |  SELECT band_idx, band, COUNT(*) AS n FROM bands GROUP BY band_idx, band
       |)
       |SELECT band_idx, COUNT(*) AS n_buckets,
       |  CAST(SUM(n) AS BIGINT) AS n_docs, MAX(n) AS max_bucket
       |FROM buckets GROUP BY band_idx
       |ORDER BY band_idx""".stripMargin
  }

  // q_minhash_bands — LSH bucket statistics per band (always non-empty;
  // the candidate-pair set itself may legitimately be empty on
  // synthetic data).
  def minhashBands(spark: SparkSession, sfDir: String): DataFrame =
    withBands(spark, sfDir)
      .groupBy(col("band_idx"), col("band"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("band_idx"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_docs"),
        max(col("n")).as("max_bucket"))
      .orderBy(col("band_idx"))

  val minhashBandsSql: String =
    s"""WITH $bandsCte, buckets AS (
       |  SELECT band_idx, band, COUNT(*) AS n FROM bands GROUP BY band_idx, band
       |)
       |SELECT band_idx, COUNT(*) AS n_buckets,
       |  CAST(SUM(n) AS BIGINT) AS n_docs, MAX(n) AS max_bucket
       |FROM buckets GROUP BY band_idx
       |ORDER BY band_idx""".stripMargin

  // q_near_dup_pairs — LSH candidate pairs: docs sharing any band.
  // Shape: ONE signature pass → skew-bounded in-bucket pair expansion
  // (store/PairExpansion: dynamic grid split keeps every task's
  // expansion ≤ ~cellSize² even for a degenerate boilerplate band —
  // the hot-bucket cap SCALING.md promises). A naive self-join would
  // compute the (expensive) signatures twice and shuffle twice; this
  // computes them once and is quadratic only within grid cells.
  /** Unordered distinct candidate-pair set (shared by the ranked
    * query surface below and dedupClusters, which would otherwise pay
    * a global sort it immediately discards).
    */
  private def candidatePairs(spark: SparkSession, sfDir: String): DataFrame =
    candidatePairsOf(spark, Catalog.table(spark, sfDir, "documents"))

  /** LSH candidate pairs of an arbitrary (doc_id, text) corpus slice. */
  private[queries] def candidatePairsOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    val bands = bandsOf(spark, docs)
    graft.store.PairExpansion.pairsWithinBuckets(
        bands, keyCols = Seq("band_idx", "band"), idCol = "doc_id")
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  def nearDupPairs(spark: SparkSession, sfDir: String): DataFrame =
    candidatePairs(spark, sfDir).orderBy(col("doc_a"), col("doc_b"))

  val nearDupPairsSql: String =
    s"""WITH $bandsCte
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.band = b.band AND a.doc_id < b.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // q_jaccard_blocked — n-gram Jaccard verification within blocking
  // keys (source, lang, length bucket): the verify step of the dedup
  // pipeline. Jaccard = |A∩B| / |A∪B| over distinct token sets;
  // single-division doubles → bit-exact across engines.
  //
  // Pair generation goes through store/PairExpansion, NOT a raw
  // self-join on the blocking keys: block sizes are data-dependent (a
  // popular (source, lang, length) cell at 100 TB holds millions of
  // docs), and the grid split bounds every task's expansion at
  // ~cellSize² while emitting the identical pair set — each doc lives
  // in exactly one block, so no cross-block dedup is needed. The
  // expansion carries IDS ONLY (plus the constant-per-block source for
  // the rollup): shipping token sets through the grid's two shuffles
  // and its sorted task lists roughly tripled this query's cost
  // (measured 0.27 s → 0.75 s at sf0.1) and would dominate at scale;
  // instead the token sets join back onto the (small) pair set from
  // the pinned docs frame — the same O(candidates) shape as
  // jaccardVerify.
  def jaccardBlocked(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.store.Iteration.materialize
    // materialize: the pair branch and the two token join-backs all
    // read `docs`; without pinning, Spark would re-tokenize the corpus
    // once per branch (no cross-branch CSE)
    val docs = materialize(Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        (col("n_chars") / lit(100)).cast("long").as("len_bucket"),
        array_distinct(Transforms.tokens(col("text"))).as("toks")))
    val pairs = graft.store.PairExpansion.pairsWithinBuckets(
        docs.select(col("doc_id"), col("source"), col("lang"), col("len_bucket")),
        keyCols = Seq("source", "lang", "len_bucket"),
        idCol = "doc_id", payloadCols = Seq("source"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.source").as("source"))
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("toks").as("toks_a")),
        Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("toks").as("toks_b")),
        Seq("doc_b"))
      .select(col("source"),
        (size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))).cast("double"))
          .as("jaccard"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("jaccard") > 0.5, 1).otherwise(0)).as("n_similar"),
        max(col("jaccard")).as("max_jaccard"))
      .orderBy(col("source"))
  }

  val jaccardBlockedSql: String =
    """WITH docs AS (
      |  SELECT doc_id, source, lang, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
      |    list_distinct(list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')) AS toks
      |  FROM documents
      |), pairs AS (
      |  SELECT a.source AS source,
      |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |    CAST(len(list_distinct(a.toks || b.toks)) AS DOUBLE) AS jaccard
      |  FROM docs a JOIN docs b
      |    ON a.source = b.source AND a.lang = b.lang
      |   AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
      |)
      |SELECT source, COUNT(*) AS n_pairs,
      |  CAST(SUM(CASE WHEN jaccard > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_similar,
      |  MAX(jaccard) AS max_jaccard
      |FROM pairs GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q_passage_dedup — passage-level duplication census: for each doc,
  // how many of its distinct word-8-gram passages also occur in some
  // OTHER document (the exact-substring-dedup signal of Lee et al.,
  // "Deduplicating Training Data Makes Language Models Better" — the
  // Spark-shaped equivalent of their suffix-array scan: sliding
  // 8-grams are the passages, an equi-join on the gram key finds the
  // cross-document repeats, never a doc×doc product). Docs shorter
  // than 8 tokens have no passages and drop out, mirroring
  // q_decontaminate's gram rule.
  //
  // Scale shape: one tokenize+explode pass (pinned via materialize —
  // the gram frame feeds both the shared-gram aggregation and the
  // per-doc rollup; without pinning Spark re-tokenizes per branch),
  // a partial-agg'd groupBy(gram) to find grams in >1 doc, a left
  // join back on the gram key, one groupBy(doc_id). A boilerplate
  // 8-gram shared by millions of docs is a hot join key — AQE skew
  // split handles it, and the build side carries only the gram
  // string. Per-doc distinct grams (array_distinct before explode)
  // bound a pathological "same sentence 1000×" doc at its distinct
  // passage count.
  def passageDedup(spark: SparkSession, sfDir: String): DataFrame =
    passageDedupOf(Catalog.table(spark, sfDir, "documents"))

  /** Passage census of an arbitrary (doc_id, text) corpus slice. */
  private[queries] def passageDedupOf(docs: DataFrame): DataFrame = {
    import graft.store.Iteration.materialize
    // native one-pass gram loop (functions/WordGrams; < 8 tokens →
    // empty array, same drop the size guard enforced) — the
    // transform-of-slices HOF chain it replaces ran interpreted
    val grams = materialize(docs
      .select(col("doc_id"), explode(graft.functions.WordGrams.wordGrams(
        docs.sparkSession, col("text"), 8, distinct = true)).as("gram")))
    // Grams are distinct per doc, so count(*) per gram = #docs holding it.
    val shared = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select(col("gram"), lit(1).as("__dup"))
    grams.join(shared, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("__dup")).as("n_dup"))
      .filter(col("n_dup") > 0)
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        (col("n_dup").cast("double") / col("n_grams").cast("double"))
          .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  val passageDedupSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '') AS toks
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    list_transform(range(0, len(toks) - 7),
      |      j -> array_to_string(toks[j+1:j+8], ' ')))) AS gram
      |  FROM toks WHERE len(toks) >= 8
      |), shared AS (
      |  SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1
      |), per_doc AS (
      |  SELECT g.doc_id, COUNT(*) AS n_grams,
      |    COUNT(CASE WHEN s.gram IS NOT NULL THEN 1 END) AS n_dup
      |  FROM grams g LEFT JOIN shared s USING (gram)
      |  GROUP BY g.doc_id
      |)
      |SELECT doc_id, n_grams, n_dup,
      |  CAST(n_dup AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_frac
      |FROM per_doc WHERE n_dup > 0
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_ngram_novelty — DIRECTIONAL novelty profile: per document, the
  // share of its distinct word-8-gram passages whose FIRST occurrence
  // in the corpus (lowest doc_id — ingestion order) is this document.
  // The curation complement of q_passage_dedup's symmetric census: a
  // low-novelty doc arriving late is boilerplate/recombination and a
  // cheap drop candidate BEFORE pair-level dedup runs, the
  // "contribution over the corpus so far" signal RefinedWeb-style
  // pipelines order sources by. Docs under 8 tokens have no passages
  // and drop out (the shared gram rule).
  //
  // Scale shape: BETTER than a first-owner join-back (which would
  // shuffle every gram string twice) — novel counts fall out of the
  // min-owner aggregate ALONE: grams are distinct per doc, so
  // groupBy(gram).min(doc_id) followed by a count per owner IS each
  // doc's novel-gram count. Two partial-agg'd aggregations over one
  // materialized gram frame, then a doc-level join of two O(docs)
  // frames — gram strings cross the wire once, "first" is a min
  // aggregate, nothing is globally ordered.
  def ngramNovelty(spark: SparkSession, sfDir: String): DataFrame =
    ngramNoveltyOf(Catalog.table(spark, sfDir, "documents"))

  /** Novelty profile of an arbitrary (doc_id, text) corpus slice. */
  private[queries] def ngramNoveltyOf(docs: DataFrame): DataFrame = {
    import graft.store.Iteration.materialize
    val grams = materialize(docs
      .select(col("doc_id"), explode(graft.functions.WordGrams.wordGrams(
        docs.sparkSession, col("text"), 8, distinct = true)).as("gram")))
    val perDoc = grams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    val novel = grams.groupBy(col("gram"))
      .agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        (coalesce(col("n_novel"), lit(0L)).cast("double")
          / col("n_grams").cast("double")).as("novelty"))
      .orderBy(col("doc_id"))
  }

  val ngramNoveltySql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '') AS toks
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    list_transform(range(0, len(toks) - 7),
      |      j -> array_to_string(toks[j+1:j+8], ' ')))) AS gram
      |  FROM toks WHERE len(toks) >= 8
      |), per_doc AS (
      |  SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id
      |), novel AS (
      |  SELECT doc_id, COUNT(*) AS n_novel FROM (
      |    SELECT MIN(doc_id) AS doc_id FROM grams GROUP BY gram
      |  ) GROUP BY doc_id
      |)
      |SELECT p.doc_id, p.n_grams,
      |  COALESCE(n.n_novel, 0) AS n_novel,
      |  CAST(COALESCE(n.n_novel, 0) AS DOUBLE)
      |    / CAST(p.n_grams AS DOUBLE) AS novelty
      |FROM per_doc p LEFT JOIN novel n USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_simhash — SimHash-16 document fingerprints: per token, 16 bits
  // derived from md5 hex digits; per bit, the signed token votes sum;
  // fingerprint = bits with positive vote. All-integer math and
  // order-independent sums → exact parity with the oracle; near-dup
  // docs differ in few bits (Hamming), enabling bucketed dedup at
  // scale (fingerprint equality or low-bit-flip candidate joins).
  private val simhashBits = 16

  private def simhash(toks: Column): Column = {
    val bitScores: Seq[Column] = (0 until simhashBits).map { j =>
      val hexPos = 1 + j / 4
      val shift = math.pow(2, 3 - j % 4).toInt
      val score = aggregate(toks, lit(0), (acc, t) => {
        val digit = instr(lit("0123456789abcdef"),
          substring(md5(t), hexPos, 1)) - 1
        val bit = (digit / lit(shift)).cast("int") % 2
        acc + (bit * 2 - 1)
      })
      when(score > 0, lit(math.pow(2, j).toInt)).otherwise(lit(0))
    }
    bitScores.reduce(_ + _)
  }

  def simhashFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), Transforms.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), simhash(col("toks")).cast("long").as("simhash16"))
      .orderBy(col("doc_id"))

  val simhashSql: String = {
    val bitExprs = (0 until simhashBits).map { j =>
      val hexPos = 1 + j / 4
      val shift = math.pow(2, 3 - j % 4).toInt
      val score = s"list_aggregate(list_transform(toks, t -> " +
        s"(((strpos('0123456789abcdef', substr(md5(t), $hexPos, 1)) - 1) // $shift) % 2) * 2 - 1), 'sum')"
      s"(CASE WHEN $score > 0 THEN ${math.pow(2, j).toInt} ELSE 0 END)"
    }
    s"""SELECT doc_id, ${bitExprs.mkString(" + ")} AS simhash16
       |FROM (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '') AS toks
       |  FROM documents
       |)
       |WHERE len(toks) > 0
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_winnow_fp — rolling-hash document fingerprinting (winnowing):
  // char-8-gram hashes → sliding-window-16 minima → distinct → digest.
  // Native expression on the Spark side (graft.functions.WinnowFp);
  // the oracle spells the identical math declaratively.
  def winnowFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    // examined r16: fanning the kernel out (Iteration.fanOutNarrow)
    // measured FLAT-to-worse here — the single map pass feeds a global
    // ORDER BY whose range-sampling re-runs the un-pinned kernel
    // either way, so the added exchange buys nothing. Left as one
    // codegen'd pass.
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.WinnowFp.winnowFp(spark, col("text")).as("winnow_fp"))
      .filter(col("winnow_fp").isNotNull)
      .orderBy(col("doc_id"))

  val winnowFpSql: String =
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(
      |    list_transform(range(1, greatest(len(grams) - 15, 1) + 1),
      |      j -> list_aggregate(grams[j:j+15], 'min')))), ',')) AS winnow_fp
      |FROM (
      |  SELECT doc_id,
      |    list_transform(range(1, length(norm) - 7 + 1),
      |      i -> substr(md5(substr(norm, i, 8)), 1, 8)) AS grams
      |  FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\W+', ' ', 'g')) AS norm
      |        FROM documents)
      |)
      |WHERE len(grams) > 0
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_simhash_blocks — web-scale simhash dedup indexing: 60-bit native
  // SimHashFp fingerprints, split into 4 exact-match blocks of 15 bits
  // (pigeonhole: any Hamming-≤4 near-dup pair collides on ≥... with 4
  // blocks, any Hamming-≤3 pair shares at least one block). Output:
  // per-block bucket statistics — the health metric that guards the
  // candidate-join fan-out.
  def simhashBlocks(spark: SparkSession, sfDir: String): DataFrame = {
    val sim = graft.functions.SimHashFp.simhashFp(spark, col("text"))
    // array-bind => ONE fingerprint eval per row (see withBands note)
    val blocksArr = flatten(transform(
      filter(array(sim), s => s.isNotNull),
      s => array((0 until 4).map(i =>
        struct(lit(i.toLong).as("block_idx"),
          shiftright(s, 15 * i).bitwiseAND(lit(32767L)).as("block_val"))): _*)))
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), explode(blocksArr).as("b"))
      .select(col("b.block_idx").as("block_idx"), col("b.block_val").as("block_val"))
      .groupBy(col("block_idx"), col("block_val"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("block_idx"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_docs"),
        max(col("n")).as("max_bucket"))
      .orderBy(col("block_idx"))
  }

  val simhashBlocksSql: String = {
    // declarative 60-bit simhash identical to the native expression
    val bitExprs = (0 until 60).map { j =>
      val hexPos = 1 + j / 4
      val shift = math.pow(2, 3 - j % 4).toLong
      val score = s"list_aggregate(list_transform(toks, t -> " +
        s"(((strpos('0123456789abcdef', substr(md5(t), $hexPos, 1)) - 1) // $shift) % 2) * 2 - 1), 'sum')"
      s"(CASE WHEN $score > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }
    s"""WITH sims AS (
       |  SELECT doc_id, ${bitExprs.mkString(" + ")} AS sim
       |  FROM (
       |    SELECT doc_id,
       |      list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '') AS toks
       |    FROM documents
       |  )
       |  WHERE len(toks) > 0
       |), blocks AS (
       |  SELECT CAST(i AS BIGINT) AS block_idx, (sim >> (15 * i)) & 32767 AS block_val
       |  FROM sims, (SELECT unnest(range(0, 4)) AS i)
       |), buckets AS (
       |  SELECT block_idx, block_val, COUNT(*) AS n FROM blocks GROUP BY block_idx, block_val
       |)
       |SELECT block_idx, COUNT(*) AS n_buckets,
       |  CAST(SUM(n) AS BIGINT) AS n_docs, MAX(n) AS max_bucket
       |FROM buckets GROUP BY block_idx
       |ORDER BY block_idx""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_simhash_near_dup — the retrieval half of the simhash scheme:
  // candidate pairs share at least one 15-bit block (exact-match
  // index), verified by full Hamming distance ≤ 8. Pair expansion is
  // skew-bounded via store/PairExpansion (grid split per block
  // bucket), carrying each doc's 60-bit fingerprint as pair payload
  // so the Hamming verify happens inline. On synthetic random docs
  // the result set is small/empty — the oracle confirms the SEMANTICS
  // either way.
  def simhashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val sim = graft.functions.SimHashFp.simhashFp(spark, col("text"))
    val simRow = flatten(transform(
      filter(array(sim), s => s.isNotNull),
      s => transform(sequence(lit(0), lit(3)), i =>
        struct((i * 15).cast("int").as("shift"), s.as("sim")))))
    val blocks = Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), explode(simRow).as("b"))
      .select(col("doc_id"), col("b.shift").as("shift"), col("b.sim").as("sim"))
      .withColumn("block_val",
        expr("(sim div cast(pow(2, shift) as bigint)) % 32768"))
    graft.store.PairExpansion.pairsWithinBuckets(
        blocks, keyCols = Seq("shift", "block_val"), idCol = "doc_id",
        payloadCols = Seq("sim"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val simhashNearDupSql: String = {
    val bitExprs = (0 until 60).map { j =>
      val hexPos = 1 + j / 4
      val shift = math.pow(2, 3 - j % 4).toLong
      val score = s"list_aggregate(list_transform(toks, t -> " +
        s"(((strpos('0123456789abcdef', substr(md5(t), $hexPos, 1)) - 1) // $shift) % 2) * 2 - 1), 'sum')"
      s"(CASE WHEN $score > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }
    s"""WITH sims AS (
       |  SELECT doc_id, ${bitExprs.mkString(" + ")} AS sim
       |  FROM (
       |    SELECT doc_id,
       |      list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '') AS toks
       |    FROM documents
       |  )
       |  WHERE len(toks) > 0
       |), blocks AS (
       |  SELECT doc_id, sim, i AS block_idx, (sim >> (15 * i)) & 32767 AS block_val
       |  FROM sims, (SELECT unnest(range(0, 4)) AS i)
       |)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
       |FROM blocks a JOIN blocks b
       |  ON a.block_idx = b.block_idx AND a.block_val = b.block_val AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= 8
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  /** Jaccard verification of LSH candidate pairs — the verify stage
    * between candidate generation and clustering. Clustering raw band
    * collisions transitively over-merges: ONE spurious collision
    * bridges two unrelated clusters, and a 100 TB corpus amplifies
    * exactly that failure. Each pair joins both sides' distinct token
    * sets (two hash joins on doc_id — candidate pairs are a tiny
    * fraction of the corpus, so these stay cheap) and survives iff
    * token-set Jaccard >= threshold. Single-division double →
    * bit-identical across engines.
    *
    * @param pairs (doc_a, doc_b) candidate pairs
    * @param docs  (doc_id, text) corpus to verify against
    */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, threshold: Double): DataFrame = {
    import graft.store.Iteration.materialize
    // Pin the pair set (its upstream — LSH banding + expansion — is
    // the expensive part and feeds THREE consumers below: the id set
    // and both joins; Spark does no cross-branch CSE), then tokenize
    // ONLY the docs the pairs reference — a semi-join keeps the
    // corpus-side scan at one pass and the pinned token frame at
    // O(candidates), not O(corpus).
    val p = materialize(pairs)
    val ids = p.select(col("doc_a").as("doc_id"))
      .unionByName(p.select(col("doc_b").as("doc_id"))).distinct()
    val toks = materialize(docs.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        array_distinct(Transforms.tokens(col("text"))).as("toks")))
    p
      .join(toks.select(col("doc_id").as("doc_a"), col("toks").as("toks_a")),
        Seq("doc_a"))
      .join(toks.select(col("doc_id").as("doc_b"), col("toks").as("toks_b")),
        Seq("doc_b"))
      .filter(
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))).cast("double")
          >= threshold)
      .select(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------------
  // q_dedup_clusters — the dedup endgame: connected components over
  // the VERIFIED near-dup graph (LSH candidates filtered through the
  // blocked-Jaccard threshold above — the verify-then-cluster
  // composition a production dedup pipeline ships), labeling every
  // involved doc with its cluster representative (min doc_id in the
  // component) so dedup keeps one doc per cluster. Iterative min-label
  // propagation with
  // POINTER JUMPING (the GraphX/GraphFrames CC shape): each round
  // every vertex takes the min over its own, its neighbors', and its
  // current label's label — the last join halves label-chain depth
  // each round, so convergence is O(log diameter) rounds even on a
  // path-shaped component (plain neighbor propagation needs
  // O(diameter), which a 60-doc edit chain would push past any fixed
  // round cap). The per-round fixpoint probe is a scalar action
  // (inherent to iterative graph algorithms); per-round outputs pin
  // through store.Iteration (reliable checkpoint() when a checkpoint
  // dir is configured, localCheckpoint otherwise) so lineage stays
  // flat; a non-converged exit THROWS rather than return wrong
  // labels. The oracle computes the same fixpoint as a recursive
  // transitive closure over the same verified pair set.
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame =
    connectedComponents(jaccardVerify(
        candidatePairs(spark, sfDir),
        Catalog.table(spark, sfDir, "documents"),
        threshold = 0.5))
      .orderBy(col("doc_id"))

  /** Min-label connected components over an undirected (doc_a, doc_b)
    * pair set → (doc_id, cluster). Public for reuse and direct spec
    * coverage (a path-shaped component exercises the pointer-jumping
    * round bound).
    *
    * HYBRID solver (the GraphFrames/Pregel "local when small" rule):
    * the edge set is already materialized for the iterative loop, so
    * one cheap count routes small graphs — the common case: the
    * VERIFIED duplicate-pair set is tiny relative to the corpus even
    * when the corpus is not — through a single bounded union-find
    * task ([[connectedComponentsLocal]]: one shuffle to one task,
    * memory O(vertices), no driver collect, bit-identical min-id
    * labels), skipping the ~5 checkpointed rounds whose per-round job
    * floor dominates at that size. Graphs past the threshold keep the
    * distributed pointer-jumping loop below.
    *
    * Each round MUST checkpoint before the next composes on it:
    * a round references its predecessor 4× (neighbor-min, the two
    * jump sides, the final join), and Spark does no cross-branch
    * common-subexpression elimination — unrolling k lazy rounds
    * re-executes round 1 up to 4^k times (measured: a 4-round unroll
    * took q_semantic_dedup from 5.4 s to 215 s at sf0.1). Persisting
    * each unrolled round (InMemoryRelation dedup within the block's
    * one job) was also measured on the real semantic edge set: k=2
    * within noise of per-round, k=4 ~2× WORSE — cache write/read
    * traffic eats the saved job scheduling. The per-round eager pin
    * is the cheap side of every variant tried.
    */
  /** Edge count up to which the one-task union-find solves CC —
    * ~200k undirected pairs keep the task's hash maps in the tens of
    * MB, far under any executor budget; overridable for specs that
    * pin the iterative path on small graphs.
    */
  private[queries] var LocalCcMaxEdges = 200000L

  /** One-task union-find CC (min-id representative) — the small-graph
    * arm of [[connectedComponents]]. One exchange to a single task;
    * state O(vertices); same labels as the fixpoint by construction
    * (union attaches the larger root under the smaller).
    */
  private[queries] def connectedComponentsLocal(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val (ra, rb) = (find(a), find(b))
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        parent.keysIterator.map(k => (k, find(k))).toSeq.iterator
      }
      .toDF("doc_id", "cluster")
  }

  def connectedComponents(pairs: DataFrame): DataFrame = {
    import graft.store.Iteration.materialize
    val undirected = materialize(pairs.select(
      col("doc_a").cast("long").as("doc_a"),
      col("doc_b").cast("long").as("doc_b")))
    if (undirected.count() <= LocalCcMaxEdges)
      return connectedComponentsLocal(undirected)
    val edges = materialize(undirected.unionByName(
        undirected.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))))
    var labels = materialize(edges.select(col("doc_a").as("id")).distinct()
      .withColumn("label", col("id")))
    var converged = labels.isEmpty
    var rounds = 0
    val maxRounds = 64 // log2-ish bound; unreachable for real graphs
    while (!converged && rounds < maxRounds) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "doc_b"), Seq("doc_b"))
        .groupBy(col("doc_a").as("id"))
        .agg(min(col("label")).as("nmin"))
      // pointer jump: label of my label (labels always point at vertex
      // ids — they are mins over vertex ids — so the join always
      // hits). Skipped in round 0 where labels are identity and the
      // jump is a no-op join.
      val joined =
        if (rounds == 0) labels.join(neighborMin, Seq("id"), "left")
          .withColumn("jmin", col("label"))
        else {
          // single pointer jump: a DOUBLE jump (label-of-label-of-
          // label) measured ~15-20% SLOWER at sf0.1 — min propagation
          // is bounded by edge-hops per round here, so the extra
          // label join buys no round reduction
          val jump = labels
            .join(labels.select(col("id").as("label"), col("label").as("jmin")),
              Seq("label"))
            .select(col("id"), col("jmin"))
          labels.join(neighborMin, Seq("id"), "left")
            .join(jump, Seq("id"), "left")
        }
      // old label rides along so the fixpoint probe is a local filter
      // over the checkpointed round output, not a second join job
      val updated = materialize(joined
        .select(col("id"),
          least(least(col("label"), coalesce(col("nmin"), col("label"))),
            coalesce(col("jmin"), col("label"))).as("label"),
          col("label").as("old")))
      converged = updated.filter(col("label") < col("old")).isEmpty
      labels = updated.drop("old")
      rounds += 1
    }
    require(converged,
      s"connected components did not converge in $maxRounds rounds")
    labels.select(col("id").as("doc_id"), col("label").as("cluster"))
  }

  val dedupClustersSql: String =
    s"""WITH RECURSIVE $bandsCte, pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band = b.band AND a.doc_id < b.doc_id
       |), toksets AS (
       |  SELECT doc_id,
       |    list_distinct(list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')) AS toks
       |  FROM documents
       |), vpairs AS (
       |  SELECT p.doc_a, p.doc_b
       |  FROM pairs p
       |  JOIN toksets a ON p.doc_a = a.doc_id
       |  JOIN toksets b ON p.doc_b = b.doc_id
       |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
       |        CAST(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
       |), edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM vpairs
       |  UNION ALL
       |  SELECT doc_b AS s, doc_a AS d FROM vpairs
       |), reach AS (
       |  SELECT s AS src, s AS dst FROM (SELECT DISTINCT s FROM edges)
       |  UNION
       |  SELECT r.src, e.d AS dst FROM reach r JOIN edges e ON r.dst = e.s
       |)
       |SELECT src AS doc_id, MIN(dst) AS cluster
       |FROM reach GROUP BY src
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_containment — ASYMMETRIC near-dup verification (Broder's
  // containment |A∩B| / |A|): symmetric Jaccard misses the
  // quote/aggregator case where a small document sits INSIDE a much
  // larger one (the union term drowns the intersection), but
  // containment of the smaller side stays high. Same LSH candidate
  // generation and O(candidates) semi-join tokenization as
  // jaccardVerify; a pair survives when EITHER side is ≥ 60%
  // contained in the other. Single-division doubles → bit-identical.
  def containmentPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.store.Iteration.materialize
    val p = materialize(candidatePairs(spark, sfDir))
    val ids = p.select(col("doc_a").as("doc_id"))
      .unionByName(p.select(col("doc_b").as("doc_id"))).distinct()
    val toks = materialize(
      Catalog.table(spark, sfDir, "documents")
        .join(ids, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          array_distinct(Transforms.tokens(col("text"))).as("toks")))
    val inter = size(array_intersect(col("toks_a"), col("toks_b")))
      .cast("double")
    p
      .join(toks.select(col("doc_id").as("doc_a"), col("toks").as("toks_a")),
        Seq("doc_a"))
      .join(toks.select(col("doc_id").as("doc_b"), col("toks").as("toks_b")),
        Seq("doc_b"))
      // zero-token docs diverge across engines at the division (Spark
      // x/0 → NULL drops the pair, DuckDB IEEE float → +inf keeps it);
      // unreachable today (band generation needs ≥3 tokens) but the
      // guard belongs HERE, not inherited from candidate generation
      .filter(size(col("toks_a")) > 0 && size(col("toks_b")) > 0)
      .select(col("doc_a"), col("doc_b"),
        (inter / size(col("toks_a")).cast("double")).as("cont_a"),
        (inter / size(col("toks_b")).cast("double")).as("cont_b"))
      .filter(col("cont_a") >= 0.6 || col("cont_b") >= 0.6)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val containmentPairsSql: String =
    s"""WITH $bandsCte, pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band = b.band AND a.doc_id < b.doc_id
       |), toksets AS (
       |  SELECT doc_id,
       |    list_distinct(list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')) AS toks
       |  FROM documents
       |)
       |SELECT p.doc_a, p.doc_b,
       |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / CAST(len(a.toks) AS DOUBLE) AS cont_a,
       |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / CAST(len(b.toks) AS DOUBLE) AS cont_b
       |FROM pairs p
       |JOIN toksets a ON p.doc_a = a.doc_id
       |JOIN toksets b ON p.doc_b = b.doc_id
       |WHERE len(a.toks) > 0 AND len(b.toks) > 0
       |  AND (CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / CAST(len(a.toks) AS DOUBLE) >= 0.6
       |   OR CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / CAST(len(b.toks) AS DOUBLE) >= 0.6)
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // q_cdc_chunks — content-defined chunking dedup (Rabin-style, per the
  // LBFS family, Muthitacharoen et al. SOSP'01): chunk boundaries come
  // from a rolling content hash, not byte offsets, so a prepended or
  // deleted prefix shifts positions without desynchronizing downstream
  // chunks — the shift-resistance fixed windows (q_chunk_windows) and
  // whole-doc winnowing digests lack. Chunks are md5-fingerprinted and
  // deduplicated through a chunk-hash equi-join (group by fingerprint,
  // never doc×doc); output is the per-doc dedup ledger: chunk count,
  // chunk chars, how many chunks another doc also has, and an
  // order-insensitive digest of the chunk set. Native O(n) rolling
  // expression on the Spark side (functions/CdcChunks); the oracle
  // folds each window outright — same polynomial mod M.
  def cdcChunks(spark: SparkSession, sfDir: String): DataFrame = {
    val chunks = Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.CdcChunks.cdcChunks(spark, col("text"))).as("c"))
      .select(col("doc_id"), col("c.clen").as("chunk_len"),
        col("c.fp").as("chunk_fp"))
    // fingerprint-keyed frequency join: |freq| = distinct chunks, the
    // shuffle key is the chunk hash — skew-free by construction
    val freq = chunks.groupBy(col("chunk_fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    chunks.join(freq, "chunk_fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("chunk_chars"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"),
        md5(concat_ws(",", sort_array(collect_list(col("chunk_fp")))))
          .as("chunks_fp"))
      .orderBy(col("doc_id"))
  }

  val cdcChunksSql: String =
    """WITH d AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '\W+', ' ', 'g')) AS norm
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, norm, length(norm) AS n,
      |    list_transform(range(1, length(norm) + 1),
      |      i -> ord(substr(norm, CAST(i AS INT), 1))) AS codes
      |  FROM d
      |  WHERE length(norm) >= 1
      |), cut AS (
      |  SELECT doc_id, norm, n,
      |    list_filter(range(16, n + 1), i ->
      |      list_reduce(list_prepend(CAST(0 AS BIGINT), codes[i-15:i]),
      |        (acc, x) -> (acc * 31 + x) % 1000000007) % 64 = 0) AS cuts
      |  FROM c
      |), sp AS (
      |  SELECT doc_id, norm,
      |    list_prepend(CAST(1 AS BIGINT), list_transform(cuts, x -> x + 1)) AS starts,
      |    list_append(cuts, CAST(n AS BIGINT)) AS ends
      |  FROM cut
      |), ch AS (
      |  SELECT doc_id,
      |    CAST(ends[k] - starts[k] + 1 AS BIGINT) AS chunk_len,
      |    md5(substr(norm, CAST(starts[k] AS INT),
      |      CAST(ends[k] - starts[k] + 1 AS INT))) AS chunk_fp
      |  FROM (SELECT doc_id, norm, starts, ends,
      |          unnest(range(1, len(starts) + 1)) AS k
      |        FROM sp)
      |  WHERE ends[k] >= starts[k]
      |), freq AS (
      |  SELECT chunk_fp, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk_fp
      |)
      |SELECT doc_id, COUNT(*) AS n_chunks,
      |  CAST(SUM(chunk_len) AS BIGINT) AS chunk_chars,
      |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
      |  md5(string_agg(chunk_fp, ',' ORDER BY chunk_fp)) AS chunks_fp
      |FROM ch JOIN freq USING (chunk_fp)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("q_cdc_chunks", cdcChunks, Some(cdcChunksSql)),
    Op("q_containment", containmentPairs, Some(containmentPairsSql)),
    Op("q_simhash_near_dup", simhashNearDup, Some(simhashNearDupSql)),
    Op("q_dedup_clusters", dedupClusters, Some(dedupClustersSql)),
    Op("q_simhash_blocks", simhashBlocks, Some(simhashBlocksSql)),
    Op("q_winnow_fp", winnowFingerprints, Some(winnowFpSql)),
    Op("q_simhash", simhashFingerprints, Some(simhashSql)),
    Op("q_dedup_exact", dedupExact, Some(dedupExactSql)),
    Op("q_dedup_keep_first", dedupKeepFirst, Some(dedupKeepFirstSql)),
    Op("q_dedup_keep_best", dedupKeepBest, Some(dedupKeepBestSql)),
    Op("q_minhash_bands", minhashBands, Some(minhashBandsSql)),
    Op("q_minhash_wide", minhashWide, Some(minhashWideSql)),
    Op("q_near_dup_pairs", nearDupPairs, Some(nearDupPairsSql)),
    Op("q_jaccard_blocked", jaccardBlocked, Some(jaccardBlockedSql)),
    Op("q_passage_dedup", passageDedup, Some(passageDedupSql)),
    Op("q_ngram_novelty", ngramNovelty, Some(ngramNoveltySql)))
}
