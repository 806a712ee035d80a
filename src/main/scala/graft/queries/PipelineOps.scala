package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.Transforms
import graft.store.Iteration.materialize

/** The LLM-training-data pipeline composed END TO END as one DAG
  * (BASELINE.json north-star): quality gate → exact dedup (keep
  * first) → near-dup verify-then-cluster (keep representative) →
  * deterministic train split → sequence packing. Each stage consumes
  * the previous stage's SURVIVORS — the composition is what a
  * production corpus build ships, whereas the standalone q_* queries
  * demonstrate each stage against the raw table.
  *
  * The census output is one row per stage with its survivor count
  * (for seq-packing: the bin count), so the whole pipeline is
  * oracle-checkable as a single 6-row result.
  *
  * Scale: every stage is the already-verified scale shape (column-math
  * gate, hash-partition groupBys, skew-bounded LSH expansion, pointer
  * -jumping CC, hash split, shard-local packing). Stage boundaries pin
  * through store.Iteration — Spark performs no common-subexpression
  * elimination across DataFrame branches, so without pinning the
  * census's six count branches would recompute the expensive survivor
  * chain once each (and the CC loop must materialize its input
  * anyway).
  */
object PipelineOps {

  // q_pipeline_census — per-stage survivor census of the composed
  // pipeline over `documents`.
  def pipelineCensus(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Catalog.table(spark, sfDir, "documents")

    // stage 2: Gopher-style quality gate (same rules as
    // q_quality_filter — ONE definition, TextOps.qualityReason)
    val quality = materialize(docs
      .filter(TextOps.qualityReason === "keep")
      .select(col("doc_id"), col("text")))

    // stage 3: exact dedup among survivors, keep lowest doc_id per
    // normalized fingerprint (insert-or-ignore content identity)
    val exact = materialize(quality
      .withColumn("keeper", min(col("doc_id")).over(
        Window.partitionBy(Transforms.exactFingerprint(col("text")))))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("text")))

    // stage 4: near-dup removal on the exact-dedup'd survivors —
    // LSH candidates → Jaccard verify → connected components → keep
    // each cluster's representative (its min doc_id label)
    val clusters = DedupOps.connectedComponents(
      DedupOps.jaccardVerify(
        DedupOps.candidatePairsOf(spark, exact), exact, threshold = 0.5))
    val nearKept = materialize(exact.join(
      clusters.filter(col("doc_id") =!= col("cluster")).select(col("doc_id")),
      Seq("doc_id"), "left_anti"))

    // stage 5: deterministic train split (same 205/256 ≈ 80% rule as
    // q_hash_split)
    val train = materialize(nearKept
      .filter(SamplingOps.hashBucket(col("doc_id")) < 205)
      .select(col("doc_id"),
        size(Transforms.tokens(col("text"))).cast("long").as("n_tokens")))

    // stage 6: shard-local sequence packing of the train split; the
    // census reports how many (shard, bin) training batches came out
    val bins = SamplingOps.packIntoBins(train, budget = 2048, nShards = 8)
      .select(col("shard"), col("bin")).distinct()

    def stageCount(stage: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(stage).as("stage"), col("n"))

    stageCount("1_total", docs)
      .unionByName(stageCount("2_quality", quality))
      .unionByName(stageCount("3_exact", exact))
      .unionByName(stageCount("4_near_dup", nearKept))
      .unionByName(stageCount("5_train", train))
      .unionByName(stageCount("6_train_bins", bins))
      .orderBy(col("stage"))
  }

  val pipelineCensusSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    val fp = "md5(trim(regexp_replace(lower(text), '\\W+', ' ', 'g')))"
    s"""WITH RECURSIVE qdocs AS (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text, ${TextOps.qualityReasonSql} AS reason
       |    FROM (SELECT doc_id, text, $toks AS toks FROM documents)
       |  ) WHERE reason = 'keep'
       |), edocs AS (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text,
       |      MIN(doc_id) OVER (PARTITION BY $fp) AS keeper
       |    FROM qdocs
       |  ) WHERE doc_id = keeper
       |), ${DedupOps.bandsCteOver("edocs")}, pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band = b.band AND a.doc_id < b.doc_id
       |), toksets AS (
       |  SELECT doc_id, list_distinct($toks) AS toks FROM edocs
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
       |), clusters AS (
       |  SELECT src AS doc_id, MIN(dst) AS cluster FROM reach GROUP BY src
       |), ndocs AS (
       |  SELECT doc_id, text FROM edocs
       |  WHERE doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster)
       |), tdocs AS (
       |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens
       |  FROM ndocs
       |  WHERE ${SamplingOps.hashBucketSql} < 205
       |), bins AS (
       |  SELECT DISTINCT shard,
       |    CAST((CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |          - n_tokens) // 2048 AS BIGINT) AS bin
       |  FROM (
       |    SELECT doc_id, (${SamplingOps.hashBucketSql}) % 8 AS shard, n_tokens
       |    FROM tdocs
       |  )
       |)
       |SELECT '1_total' AS stage, COUNT(*) AS n FROM documents
       |UNION ALL SELECT '2_quality', COUNT(*) FROM qdocs
       |UNION ALL SELECT '3_exact', COUNT(*) FROM edocs
       |UNION ALL SELECT '4_near_dup', COUNT(*) FROM ndocs
       |UNION ALL SELECT '5_train', COUNT(*) FROM tdocs
       |UNION ALL SELECT '6_train_bins', COUNT(*) FROM bins
       |ORDER BY stage""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_decontaminate — benchmark decontamination: train-split documents
  // sharing any word-8-gram with the held-out test split (the
  // Brown/GPT-3-style n-gram overlap rule). The eval side's distinct
  // grams join the train side's grams on the gram key — an equi-join
  // on a derived key, never a doc×doc product; a doc shorter than the
  // gram length can neither contaminate nor be contaminated, so both
  // sides filter before exploding (the oracle's empty gram lists drop
  // in the unnest).
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Catalog.table(spark, sfDir, "documents")
    val bucket = SamplingOps.hashBucket(col("doc_id"))
    // native one-pass gram loop (functions/WordGrams; < 8 tokens →
    // empty array ≡ the oracle's empty gram lists dropping in unnest)
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), explode(graft.functions.WordGrams.wordGrams(
        spark, col("text"), 8, distinct = true)).as("gram"))
    val evalGrams = grams(docs.filter(bucket >= 230))
      .select(col("gram")).distinct()
    // bloom pre-filter on the TRAIN gram stream before it shuffles:
    // the eval side is small (held-out split), its bloom blob is tiny,
    // and a broadcast bit-test drops the overwhelmingly-clean train
    // grams map-side, so the exact equi-join below sees every real
    // contamination and the result set is
    // IDENTICAL to the unpruned plan (the join absorbs the ~1% false
    // positives — no false negatives means no contamination is ever
    // missed). At 100 TB this is the difference between shuffling
    // every train 8-gram and shuffling only suspects. might_contain
    // demands a constant filter OR a scalar subquery — the blob is
    // built as a SCALAR SUBQUERY (Spark's own runtime-filter shape),
    // so it runs lazily at action time and merely CONSTRUCTING this
    // frame (plan audits, Inventory iteration) stays job-free. An
    // empty eval side yields a NULL blob, might_contain → NULL drops
    // every train gram — correct, since the exact join below would be
    // empty anyway.
    graft.functions.BloomFns.register(spark)
    // view names carry the sfDir hash: concurrent constructions over
    // DIFFERENT data dirs cannot cross-resolve; same-dir re-
    // registration is idempotent (identical definition). The eval
    // side is computed twice per action (subquery + exact join) —
    // accepted: it is the small held-out split, and the alternative
    // (an eager checkpoint) would run jobs at construction time.
    val tag = Integer.toHexString(sfDir.hashCode)
    val evalView = s"graft_decon_eval_grams_$tag"
    val trainView = s"graft_decon_train_grams_$tag"
    evalGrams.createOrReplaceTempView(evalView)
    grams(docs.filter(bucket < 205)).createOrReplaceTempView(trainView)
    val suspect = spark.sql(
      s"""SELECT doc_id, gram FROM $trainView
         |WHERE graft_might_contain(
         |  (SELECT graft_bloom_agg(xxhash64(gram), 100000L, 1000000L)
         |   FROM $evalView),
         |  xxhash64(gram))""".stripMargin)
    suspect
      .join(evalGrams, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  val decontaminateSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    s"""WITH grams AS (
       |  SELECT doc_id, b, unnest(list_distinct(
       |    list_transform(range(0, greatest(len(toks) - 7, 0)),
       |      j -> array_to_string(toks[j+1:j+8], ' ')))) AS gram
       |  FROM (SELECT doc_id, $toks AS toks,
       |          ${SamplingOps.hashBucketSql} AS b
       |        FROM documents)
       |), eval_grams AS (
       |  SELECT DISTINCT gram FROM grams WHERE b >= 230
       |)
       |SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared
       |FROM grams g JOIN eval_grams e USING (gram)
       |WHERE g.b < 205
       |GROUP BY g.doc_id
       |ORDER BY g.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_mixture_weights — data-mixture bookkeeping: per-source document
  // and token counts plus each source's share of the total token
  // budget (the sampling-weight table a mixture-aware training loader
  // consumes). One partial-agg'd groupBy; the total rides a single
  // unpartitioned window over the 20 aggregated rows, not the corpus.
  // Weight is a single division of exact longs → bit-exact.
  def mixtureWeights(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Catalog.table(spark, sfDir, "documents")
      .select(col("source"),
        size(Transforms.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .withColumn("weight",
        col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(Window.partitionBy()).cast("double"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"))
      .orderBy(col("source"))
  }

  val mixtureWeightsSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    s"""SELECT source, n_docs, n_tokens,
       |  CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS weight
       |FROM (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(CAST(len($toks) AS BIGINT)) AS BIGINT) AS n_tokens
       |  FROM documents
       |  GROUP BY source
       |)
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_importance_weights — DSIR-style data selection (Xie et al. 2023,
  // "Data Selection for Language Models via Importance Resampling"):
  // score every raw document by how much it resembles a TARGET domain
  // (here: source 'src0'; production passes any target predicate),
  // using hashed-unigram bag-of-words models — each token hashes to
  // one of 256 buckets (first md5 byte, the q_hash_split convention),
  // the target and raw distributions are 256-row count tables (one
  // partial-agg'd pass, both counts in the same groupBy), and a doc's
  // weight sums its tokens' smoothed probability ratios
  // p_target(b)/p_raw(b). High-weight docs are the ones importance
  // resampling keeps (selection itself = the q_topk / q_hash_split
  // plan family over this output).
  //
  // DSIR sums log-ratios; like q_lm_bigram_score this kernel sums
  // LINEAR ratios quantized to 1e-6 longs — ln() is not IEEE-pinned
  // across engines, while the ratio is two exact-int-valued divisions,
  // one multiply, one floor: bit-stable everywhere, same resemblance
  // ordering. Scale shape: the stats table is 256 rows (broadcast);
  // scoring is a narrow map + one broadcast join + one per-doc partial
  // agg — no shuffle ever carries the token stream.
  private val dsirTarget = "src0"
  private val dsirB = 256

  /** The DSIR weight computation over any (doc_id, source, text)
    * frame: (doc_id, n_toks, weight_q). Shared by the standalone
    * q_importance_weights and the composed curation census.
    */
  private[queries] def dsirWeights(docs: DataFrame): DataFrame = {
    import graft.store.Iteration.materialize
    // pinned narrow (doc_id, bucket) token frame: feeds the stats pass
    // and the scoring join (tokenize once, ints only downstream)
    // examined r16: a fan-out (Iteration.fanOutNarrow) before the
    // tokenize+md5 measured 1.31x SLOWER on the interleaved A/B —
    // the extra exchange + repartition tasks cost more than the
    // single-task kernel saves on this host. Left as-is.
    val tb = materialize(docs
      .select(col("doc_id"), col("source"),
        explode(Transforms.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("source"),
        SamplingOps.hashBucket(col("tok")).as("b")))
    val stats = tb.groupBy(col("b"))
      .agg(count(lit(1)).as("c_r"),
        count(when(col("source") === dsirTarget, 1)).as("c_t"))
    val totals = stats.agg(sum(col("c_r")).as("n_r"), sum(col("c_t")).as("n_t"))
    val ratioQ = floor(
      (col("c_t") + lit(1)).cast("double") / (col("c_r") + lit(1)).cast("double") *
        ((col("n_r") + lit(dsirB)).cast("double") /
          (col("n_t") + lit(dsirB)).cast("double")) * lit(1e6)).cast("long")
    tb.join(broadcast(stats), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), ratioQ.as("rq"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("rq")).as("weight_q"))
  }

  def importanceWeights(spark: SparkSession, sfDir: String): DataFrame =
    dsirWeights(Catalog.table(spark, sfDir, "documents"))
      .orderBy(col("doc_id"))

  val importanceWeightsSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    val bucket = "(strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 + " +
      "strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1"
    s"""WITH tb AS (
       |  SELECT doc_id, source, $bucket AS b
       |  FROM (SELECT doc_id, source, unnest($toks) AS tok FROM documents)
       |), stats AS (
       |  SELECT b, COUNT(*) AS c_r,
       |    COUNT(CASE WHEN source = '$dsirTarget' THEN 1 END) AS c_t
       |  FROM tb GROUP BY b
       |), tot AS (
       |  SELECT SUM(c_r) AS n_r, SUM(c_t) AS n_t FROM stats
       |)
       |SELECT tb.doc_id, COUNT(*) AS n_toks,
       |  CAST(SUM(CAST(floor(
       |    CAST(s.c_t + 1 AS DOUBLE) / CAST(s.c_r + 1 AS DOUBLE) *
       |    (CAST(t.n_r + $dsirB AS DOUBLE) / CAST(t.n_t + $dsirB AS DOUBLE)) * 1e6)
       |    AS BIGINT)) AS BIGINT) AS weight_q
       |FROM tb JOIN stats s ON tb.b = s.b CROSS JOIN tot t
       |GROUP BY tb.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_curation_census — a second composed pipeline over the curation
  // stages this round added, in the order a web-corpus build applies
  // them: per-domain cap (no host dominates) → DSIR top-half per
  // source (keep the docs most resembling the target domain; weights
  // computed on the CAPPED survivors, as a real pipeline would) →
  // exact dedup keep-first. Per-stage (n_docs, n_tokens) survivor
  // counts, every stage consuming the previous stage's output; stage
  // frames pin through Iteration so the census branches never
  // recompute the chain (same discipline as q_pipeline_census).
  def curationCensus(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.store.Iteration.materialize
    val docs = materialize(Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"),
        size(Transforms.tokens(col("text"))).cast("long").as("n_toks")))
    val capped = materialize(docs
      .withColumn("rnk", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rnk") <= SamplingOps.domainCapN)
      .select(col("doc_id"), col("source"), col("text"), col("n_toks")))
    val wts = dsirWeights(capped)
    val sel = materialize(capped
      .join(wts.select(col("doc_id"), col("weight_q")), Seq("doc_id"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("weight_q").desc, col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("source"))))
      .filter(col("rnk") * 2 <= col("cnt"))
      .select(col("doc_id"), col("text"), col("n_toks")))
    val deduped = sel
      .withColumn("rnk", row_number().over(
        Window.partitionBy(Transforms.exactFingerprint(col("text")))
          .orderBy(col("doc_id"))))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("n_toks"))

    def census(idx: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))

    census(0, "raw", docs)
      .unionByName(census(1, "domain_cap", capped))
      .unionByName(census(2, "dsir_top_half", sel))
      .unionByName(census(3, "exact_dedup", deduped))
      .orderBy(col("stage_idx"))
  }

  val curationCensusSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    val bucket = "(strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 + " +
      "strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1"
    s"""WITH docs AS (
       |  SELECT doc_id, source, text, n_chars,
       |    CAST(len($toks) AS BIGINT) AS n_toks
       |  FROM documents
       |), capped AS (
       |  SELECT doc_id, source, text, n_toks FROM (
       |    SELECT doc_id, source, text, n_toks,
       |      ROW_NUMBER() OVER (PARTITION BY source
       |        ORDER BY n_chars DESC, doc_id) AS rnk
       |    FROM docs) WHERE rnk <= ${SamplingOps.domainCapN}
       |), tb AS (
       |  SELECT doc_id, source, $bucket AS b
       |  FROM (SELECT doc_id, source, unnest($toks) AS tok FROM capped)
       |), stats AS (
       |  SELECT b, COUNT(*) AS c_r,
       |    COUNT(CASE WHEN source = '$dsirTarget' THEN 1 END) AS c_t
       |  FROM tb GROUP BY b
       |), tot AS (
       |  SELECT SUM(c_r) AS n_r, SUM(c_t) AS n_t FROM stats
       |), wts AS (
       |  SELECT tb.doc_id,
       |    CAST(SUM(CAST(floor(
       |      CAST(s.c_t + 1 AS DOUBLE) / CAST(s.c_r + 1 AS DOUBLE) *
       |      (CAST(t.n_r + $dsirB AS DOUBLE) / CAST(t.n_t + $dsirB AS DOUBLE)) * 1e6)
       |      AS BIGINT)) AS BIGINT) AS weight_q
       |  FROM tb JOIN stats s ON tb.b = s.b CROSS JOIN tot t
       |  GROUP BY tb.doc_id
       |), sel AS (
       |  SELECT doc_id, text, n_toks FROM (
       |    SELECT c.doc_id, c.text, c.n_toks,
       |      ROW_NUMBER() OVER (PARTITION BY c.source
       |        ORDER BY w.weight_q DESC, c.doc_id) AS rnk,
       |      COUNT(*) OVER (PARTITION BY c.source) AS cnt
       |    FROM capped c JOIN wts w ON c.doc_id = w.doc_id)
       |  WHERE rnk * 2 <= cnt
       |), dedup AS (
       |  SELECT doc_id, n_toks FROM (
       |    SELECT doc_id, n_toks,
       |      ROW_NUMBER() OVER (
       |        PARTITION BY md5(trim(regexp_replace(lower(text), '\\W+', ' ', 'g')))
       |        ORDER BY doc_id) AS rnk
       |    FROM sel) WHERE rnk = 1
       |)
       |SELECT * FROM (
       |  SELECT 0 AS stage_idx, 'raw' AS stage, COUNT(*) AS n_docs,
       |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens FROM docs
       |  UNION ALL SELECT 1, 'domain_cap', COUNT(*),
       |    CAST(SUM(n_toks) AS BIGINT) FROM capped
       |  UNION ALL SELECT 2, 'dsir_top_half', COUNT(*),
       |    CAST(SUM(n_toks) AS BIGINT) FROM sel
       |  UNION ALL SELECT 3, 'exact_dedup', COUNT(*),
       |    CAST(SUM(n_toks) AS BIGINT) FROM dedup
       |)
       |ORDER BY stage_idx""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_mixture_temperature — temperature-scaled mixture weights (the
  // T5/mT5 multilingual sampling rule: raw token-count shares starve
  // small sources, so sample ∝ share^(1/T), here T=2 i.e. sqrt —
  // boosting the tail, damping the head). sqrt is the one fractional
  // power that is IEEE-exact everywhere, and the scaled weights
  // quantize to 1e-6 longs before the normalizing sum so the result
  // is partitioning- and engine-independent. One partial-agg'd
  // groupBy; the normalization window runs over the per-source rows
  // (20), never the corpus — same shape as q_mixture_weights.
  def mixtureTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Catalog.table(spark, sfDir, "documents")
      .select(col("source"),
        size(Transforms.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("n_tokens"))
      .withColumn("sq", floor(sqrt(col("n_tokens").cast("double")) * lit(1e6))
        .cast("long"))
      .withColumn("weight",
        col("sq").cast("double") /
          sum(col("sq")).over(Window.partitionBy()).cast("double"))
      .select(col("source"), col("n_tokens"), col("weight"))
      .orderBy(col("source"))
  }

  val mixtureTemperatureSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    s"""WITH src AS (
       |  SELECT source,
       |    CAST(SUM(CAST(len($toks) AS BIGINT)) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source
       |), scaled AS (
       |  SELECT source, n_tokens,
       |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS sq
       |  FROM src
       |)
       |SELECT source, n_tokens,
       |  CAST(sq AS DOUBLE) / CAST(SUM(sq) OVER () AS DOUBLE) AS weight
       |FROM scaled
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_corpus_release — THE composed corpus-build, end to end: scrub
  // (typed-placeholder masking) → keep-best exact dedup (quality =
  // masked length, lowest id tiebreak) → train split + 8-gram
  // decontamination against the held-out split → per-source
  // token-budget mixture — measured as one census (stage, n). The
  // `build-corpus` CLI verb runs the SAME stages, writes the mixture
  // as a governed table, and tags + fingerprints the release: the
  // end-to-end story the individual primitives exist for. Every stage
  // keeps its verified scale shape: map-only codegen'd scrub chain,
  // one fp-partitioned top-1 window (InferWindowGroupLimit), the
  // bloom-suspect gram join (only suspects shuffle), one per-source
  // bounded window — stage boundaries pinned via store.Iteration like
  // pipelineCensus.
  def corpusRelease(spark: SparkSession, sfDir: String): DataFrame =
    releaseFrames(spark, Catalog.table(spark, sfDir, "documents"),
      defaultReleaseBudget, Integer.toHexString(sfDir.hashCode))._1

  /** Default per-source token budget of the release mixture — shared
    * with the oracle SQL and the `build-corpus` CLI default.
    */
  val defaultReleaseBudget: Long = SamplingOps.tokenBudgetN

  /** (census, mixture) of the composed release over an arbitrary
    * documents frame — the CLI writes the mixture governed and tags
    * it; the census is the oracle-checked measurement.
    */
  private[graft] def releaseFrames(
      spark: SparkSession, docsRaw: DataFrame, budget: Long,
      viewTag: String): (DataFrame, DataFrame) = {
    val scrubbed = materialize(docsRaw.select(col("doc_id"), col("source"),
      col("text").as("raw"),
      TextOps.scrubbedText(col("text")).as("text")))
    val wq = Window.partitionBy(col("fp"))
      .orderBy(length(col("text")).desc, col("doc_id"))
    val keepBest = materialize(scrubbed
      .withColumn("fp", Transforms.exactFingerprint(col("text")))
      .withColumn("_rk", row_number().over(wq))
      .filter(col("_rk") === 1)
      .select(col("doc_id"), col("source"), col("text")))
    val bucket = SamplingOps.hashBucket(col("doc_id"))
    val train = materialize(keepBest.filter(bucket < 205))
    val evalDocs = scrubbed.filter(bucket >= 230)
    val clean = materialize(train.join(
      contaminatedIds(spark, train, evalDocs, viewTag),
      Seq("doc_id"), "left_anti"))
    val wmix = Window.partitionBy(col("source"))
      .orderBy(SamplingOps.hashBucket(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mixture = materialize(clean
      .withColumn("n_tokens", size(Transforms.tokens(col("text"))).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wmix))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("text"), col("n_tokens")))
    def stageCount(stage: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(stage).as("stage"), col("n"))
    val census = stageCount("1_total", docsRaw)
      .unionByName(stageCount("2_scrub_changed",
        scrubbed.filter(col("text") =!= col("raw"))))
      .unionByName(stageCount("3_keep_best", keepBest))
      .unionByName(stageCount("4_train", train))
      .unionByName(stageCount("5_clean", clean))
      .unionByName(stageCount("6_mixture_docs", mixture))
      .unionByName(mixture
        .agg(coalesce(sum(col("n_tokens")), lit(0L)).as("n"))
        .select(lit("7_mixture_tokens").as("stage"), col("n")))
      .orderBy(col("stage"))
    (census, mixture)
  }

  /** doc_ids of `train` docs sharing any word-8-gram with `evalDocs` —
    * the bloom-suspect shape of [[decontaminate]] generalized to
    * arbitrary (doc_id, text) frames: the eval side's bloom blob drops
    * clean train grams map-side, the exact equi-join confirms, no
    * false negatives.
    */
  private def contaminatedIds(
      spark: SparkSession, train: DataFrame, evalDocs: DataFrame,
      tag: String): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), explode(graft.functions.WordGrams.wordGrams(
        spark, col("text"), 8, distinct = true)).as("gram"))
    // examined r16: pinning this (it feeds the bloom-blob subquery
    // AND the confirm join) measured slower on the interleaved A/B —
    // the two lazy branches overlap on idle local cores while a pin
    // serializes them. Kept lazy, like standalone decontaminate.
    val evalGrams = grams(evalDocs.select(col("doc_id"), col("text")))
      .select(col("gram")).distinct()
    graft.functions.BloomFns.register(spark)
    val evalView = s"graft_release_eval_grams_$tag"
    val trainView = s"graft_release_train_grams_$tag"
    evalGrams.createOrReplaceTempView(evalView)
    grams(train.select(col("doc_id"), col("text")))
      .createOrReplaceTempView(trainView)
    spark.sql(
      s"""SELECT doc_id, gram FROM $trainView
         |WHERE graft_might_contain(
         |  (SELECT graft_bloom_agg(xxhash64(gram), 100000L, 1000000L)
         |   FROM $evalView),
         |  xxhash64(gram))""".stripMargin)
      .join(evalGrams, Seq("gram"))
      .select(col("doc_id")).distinct()
  }

  val corpusReleaseSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    val fp = "md5(trim(regexp_replace(lower(text), '\\W+', ' ', 'g')))"
    val chain = TextOps.scrubChainSql("text")
    val b = SamplingOps.hashBucketSql
    val gramsOf =
      """unnest(list_distinct(list_transform(
        |      range(0, greatest(len(toks) - 7, 0)),
        |      j -> array_to_string(toks[j+1:j+8], ' ')))) AS gram""".stripMargin
    s"""WITH scrub AS (
       |  SELECT doc_id, source, text AS raw, $chain AS text FROM documents
       |), kb AS (
       |  SELECT doc_id, source, text FROM (
       |    SELECT doc_id, source, text,
       |      ROW_NUMBER() OVER (PARTITION BY $fp
       |        ORDER BY len(text) DESC, doc_id) AS rk
       |    FROM scrub) WHERE rk = 1
       |), train AS (
       |  SELECT doc_id, source, text FROM kb WHERE $b < 205
       |), eval_grams AS (
       |  SELECT DISTINCT gram FROM (
       |    SELECT $gramsOf
       |    FROM (SELECT $toks AS toks FROM scrub WHERE $b >= 230))
       |), contaminated AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_id, $gramsOf
       |    FROM (SELECT doc_id, $toks AS toks FROM train)
       |  ) g JOIN eval_grams e USING (gram)
       |), clean AS (
       |  SELECT doc_id, source, text FROM train
       |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
       |), mix AS (
       |  SELECT doc_id, n_tokens FROM (
       |    SELECT doc_id, n_tokens,
       |      SUM(n_tokens) OVER (PARTITION BY source ORDER BY bucket, doc_id
       |        ROWS UNBOUNDED PRECEDING) AS cum
       |    FROM (SELECT source, doc_id,
       |        CAST(len($toks) AS BIGINT) AS n_tokens, $b AS bucket
       |      FROM clean))
       |  WHERE cum <= ${SamplingOps.tokenBudgetN}
       |)
       |SELECT stage, n FROM (
       |  SELECT '1_total' AS stage, COUNT(*) AS n FROM documents
       |  UNION ALL SELECT '2_scrub_changed', COUNT(*) FROM scrub WHERE text <> raw
       |  UNION ALL SELECT '3_keep_best', COUNT(*) FROM kb
       |  UNION ALL SELECT '4_train', COUNT(*) FROM train
       |  UNION ALL SELECT '5_clean', COUNT(*) FROM clean
       |  UNION ALL SELECT '6_mixture_docs', COUNT(*) FROM mix
       |  UNION ALL SELECT '7_mixture_tokens',
       |    COALESCE(CAST(SUM(n_tokens) AS BIGINT), 0) FROM mix)
       |ORDER BY stage""".stripMargin
  }

  def ops: Seq[Op] = Seq(
    Op("q_corpus_release", corpusRelease, Some(corpusReleaseSql)),
    Op("q_pipeline_census", pipelineCensus, Some(pipelineCensusSql)),
    Op("q_mixture_temperature", mixtureTemperature, Some(mixtureTemperatureSql)),
    Op("q_curation_census", curationCensus, Some(curationCensusSql)),
    Op("q_decontaminate", decontaminate, Some(decontaminateSql)),
    Op("q_importance_weights", importanceWeights, Some(importanceWeightsSql)),
    Op("q_mixture_weights", mixtureWeights, Some(mixtureWeightsSql)))
}
