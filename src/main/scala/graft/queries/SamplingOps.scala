package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Transforms

/** Deterministic corpus splitting and sampling for training-data
  * pipelines (BASELINE.json north-star extension): assignments derive
  * purely from a hash of the document id, so they are reproducible
  * across runs, engines and data orderings, stable under corpus
  * growth (a doc never migrates between splits when new docs arrive —
  * the property `rand()`-based sampling lacks), and need no shuffle:
  * split assignment is a narrow codegen'd map.
  *
  * The hash bucket is the first md5 byte of the decimal-rendered id
  * (0-255), identically computable in any engine with md5.
  */
object SamplingOps {

  /** First md5 byte of the id rendered in decimal: 0-255. Shared with
    * the streaming budget sink (StreamTokenBudget) — ONE definition of
    * the deterministic admission order.
    */
  private[graft] def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 2), 16, 10).cast("int")

  private[queries] val hashBucketSql =
    "(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 + " +
      "strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1"

  // ---------------------------------------------------------------------
  // q_hash_split — train/val/test assignment: train < 205/256 (~80%),
  // val < 230/256 (~10%), test otherwise (~10%).
  def hashSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val b = hashBucket(col("doc_id"))
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), b.as("bucket"),
        when(b < 205, "train").when(b < 230, "val").otherwise("test")
          .as("split"))
      .orderBy(col("doc_id"))
  }

  val hashSplitSql: String =
    s"""SELECT doc_id, CAST($hashBucketSql AS INT) AS bucket,
       |  CASE WHEN $hashBucketSql < 205 THEN 'train'
       |       WHEN $hashBucketSql < 230 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_stratified_sample — deterministic ~25% subsample per stratum
  // (language): counts before/after, the hygiene readout of a
  // downsampling stage. COUNT of a conditional (never SUM) keeps both
  // engines in BIGINT.
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val b = hashBucket(col("doc_id"))
    Catalog.table(spark, sfDir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        count(when(b < 64, 1)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  val stratifiedSampleSql: String =
    s"""SELECT lang, COUNT(*) AS n_total,
       |  COUNT(CASE WHEN $hashBucketSql < 64 THEN 1 END) AS n_sampled
       |FROM documents
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q_seq_pack — greedy sequence packing: assign documents to fixed
  // token-budget bins (the packing stage that turns a corpus into
  // training batches). Packing is inherently sequential, so it runs
  // PER SHARD: a deterministic hash shard (first md5 byte % nShards)
  // keys a bounded window — running token total within (shard, doc
  // order) — and bin = tokens-before-this-doc div budget. Each shard's
  // window state is one running sum.
  private val packBudget = 2048

  /** Shard-local greedy packing of (doc_id, n_tokens) rows into
    * token-budget bins. `nShards` bounds window parallelism: it
    * defaults to the session's shuffle parallelism so the window stage
    * scales with the cluster instead of capping at a constant
    * (global-order packing would funnel the corpus into one task).
    * Shard membership is a pure hash of doc_id, so each shard's bins
    * depend only on that shard's docs — adding shards re-shards but
    * never reorders packing within a shard.
    */
  def packIntoBins(docs: DataFrame, budget: Int, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), pmod(hashBucket(col("doc_id")), lit(nShards)).as("shard"),
        col("n_tokens"))
      .withColumn("bin",
        ((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget)
          .cast("long"))
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        col("n_tokens"), col("bin"))
  }

  /** Cluster-sized default: one packing shard per shuffle partition.
    * NOTE: because the conf is read at call time, the (shard, bin)
    * assignment varies with the session's cluster sizing (and confs
    * like "auto" don't parse at all — they fall back to 200 here);
    * reproducible packing across environments requires the explicit
    * `nShards` overload.
    */
  def packIntoBins(docs: DataFrame, budget: Int): DataFrame = {
    val conf = docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    val nShards = scala.util.Try(conf.toInt).toOption.filter(_ > 0).getOrElse(200)
    packIntoBins(docs, budget, nShards)
  }

  // The oracle-checked query keeps the original 8 shards so its SQL
  // stays engine-independent; callers sizing for a cluster use the
  // default overload above.
  def seqPack(spark: SparkSession, sfDir: String): DataFrame =
    packIntoBins(
      Catalog.table(spark, sfDir, "documents")
        .select(col("doc_id"),
          size(Transforms.tokens(col("text"))).cast("long").as("n_tokens")),
      packBudget, nShards = 8)
      .orderBy(col("doc_id"))

  val seqPackSql: String =
    s"""SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
       |  CAST((CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |        - n_tokens) // $packBudget AS BIGINT) AS bin
       |FROM (
       |  SELECT doc_id, ($hashBucketSql) % 8 AS shard,
       |    CAST(len(list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')) AS BIGINT) AS n_tokens
       |  FROM documents
       |)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_shuffle_order — deterministic global corpus shuffle: the final
  // stage before training-data emission orders documents by a seeded
  // hash of their id, so (a) the order is reproducible on any cluster
  // shape / engine, (b) re-running with a new seed reshuffles, and
  // (c) a grown corpus inserts new docs WITHOUT permuting the
  // relative order of old ones (their keys are unchanged — an
  // epoch-stable shuffle). At scale this is one total-order sort —
  // Spark's range-partitioned exchange — which is the unavoidable
  // cost of a global shuffle; per-shard local shuffles compose with
  // packIntoBins when approximate shuffling suffices. Top 25 keeps
  // the oracle row set small while pinning the full ordering logic.
  def shuffleOrder(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        md5(concat(lit("seed42|"), col("doc_id").cast("string")))
          .as("shuffle_key"))
      .orderBy(col("shuffle_key"), col("doc_id"))
      .limit(25)

  val shuffleOrderSql: String =
    """SELECT doc_id, md5('seed42|' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      |FROM documents
      |ORDER BY shuffle_key, doc_id
      |LIMIT 25""".stripMargin

  // ---------------------------------------------------------------------
  // q_token_budget — greedy per-source fill to a fixed TOKEN budget,
  // the "assemble an N-token mixture" step of every pretraining-data
  // build (mixture recipes are stated in tokens, not documents — a
  // domain of long docs must admit fewer of them). Docs admit in a
  // deterministic hash-shuffled order (md5 bucket, doc_id tiebreak) so
  // the fill is an unbiased reproducible sample rather than a
  // doc_id-prefix artifact, and a doc stays admitted as the corpus
  // grows until its domain's budget fills. One per-source running-sum
  // window: state bounded per key, one hash shuffle, no global sort.
  private[queries] val tokenBudgetN = 600L

  def tokenBudget(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(hashBucket(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        size(Transforms.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= tokenBudgetN)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"), col("doc_id"))
  }

  val tokenBudgetSql: String =
    s"""SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(cum AS BIGINT) AS cum_tokens
       |FROM (
       |  SELECT source, doc_id, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY bucket, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM (
       |    SELECT source, doc_id,
       |      len(list_filter(string_split_regex(lower(text), '\\W+'),
       |        t -> t <> '')) AS n_tokens,
       |      $hashBucketSql AS bucket
       |    FROM documents))
       |WHERE cum <= $tokenBudgetN
       |ORDER BY source, cum_tokens, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_domain_cap — the per-domain document cap every web-scale corpus
  // build applies (C4 / RefinedWeb style: no single host may dominate
  // the mixture): within each source, keep the top `domainCapN` docs
  // by a quality key (here length desc, doc_id tiebreak — production
  // plugs any scored column into the same plan) and report the
  // per-source census. This CENSUS form ranks every row (n_docs
  // counts the whole group), so the plan is one per-source window —
  // state bounded per key, one hash shuffle, sort within partitions,
  // no global sort. The SELECTION form — `filter(rnk <= cap)`, as the
  // capped stage of q_curation_census runs — additionally triggers
  // InferWindowGroupLimit, shipping only each partition's local top-N
  // through the exchange.
  private[queries] val domainCapN = 20

  def domainCap(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Catalog.table(spark, sfDir, "documents")
      .withColumn("rnk", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("rnk") <= domainCapN, 1)).as("n_kept"),
        sum(when(col("rnk") <= domainCapN, col("n_chars"))).as("kept_chars"))
      .orderBy(col("source"))
  }

  val domainCapSql: String =
    s"""SELECT source, COUNT(*) AS n_docs,
       |  COUNT(CASE WHEN rnk <= $domainCapN THEN 1 END) AS n_kept,
       |  CAST(SUM(CASE WHEN rnk <= $domainCapN THEN n_chars END) AS BIGINT) AS kept_chars
       |FROM (
       |  SELECT source, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id) AS rnk
       |  FROM documents
       |)
       |GROUP BY source
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q_chunk_windows — overlapping fixed-token chunking, the stage that
  // turns variable-length documents into model-sized training windows
  // (stride < size ⇒ consecutive chunks overlap, so no token sits
  // only at a hard boundary — the standard pretraining/RAG window
  // rule). Pure per-row work: chunk count is integer arithmetic on
  // the token count, windows materialize with an in-row
  // sequence→slice transform and explode — a narrow codegen'd map, no
  // shuffle anywhere (the output's natural key (doc_id, chunk_idx)
  // partitions downstream work). Chunks emit a content fingerprint
  // rather than text so the result stays narrow; the final short
  // chunk keeps whatever tokens remain (slice clamps identically in
  // both engines).
  private val chunkSize = 64
  private val chunkStride = 48

  def chunkWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), Transforms.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 1)
    val nChunks = when(col("n") <= chunkSize, lit(1L))
      .otherwise(floor((col("n") - chunkSize + chunkStride - 1).cast("double")
        / chunkStride) + 1L)
    docs.withColumn("nc", nChunks)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0L), col("nc") - 1),
        j => struct(j.as("chunk_idx"),
          slice(col("toks"), (j * chunkStride + 1).cast("int"), lit(chunkSize))
            .as("ctoks")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        size(col("c.ctoks")).cast("long").as("n_chunk_toks"),
        md5(concat_ws(" ", col("c.ctoks"))).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val chunkWindowsSql: String = {
    val toks = """list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"""
    val lo = s"CAST(j * $chunkStride AS INT) + 1"
    val hi = s"CAST(j * $chunkStride AS INT) + $chunkSize"
    s"""WITH d AS (
       |  SELECT doc_id, toks, n,
       |    CASE WHEN n <= $chunkSize THEN 1
       |         ELSE CAST(floor(CAST(n - $chunkSize + $chunkStride - 1 AS DOUBLE)
       |           / $chunkStride.0) AS BIGINT) + 1 END AS nc
       |  FROM (SELECT doc_id, $toks AS toks, len($toks) AS n FROM documents)
       |  WHERE n >= 1
       |), ex AS (
       |  SELECT doc_id, toks, unnest(range(0, nc)) AS j FROM d
       |)
       |SELECT doc_id, CAST(j AS BIGINT) AS chunk_idx,
       |  CAST(len(toks[$lo:$hi]) AS BIGINT) AS n_chunk_toks,
       |  md5(array_to_string(toks[$lo:$hi], ' ')) AS chunk_fp
       |FROM ex
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  def ops: Seq[Op] = Seq(
    Op("q_chunk_windows", chunkWindows, Some(chunkWindowsSql)),
    Op("q_domain_cap", domainCap, Some(domainCapSql)),
    Op("q_token_budget", tokenBudget, Some(tokenBudgetSql)),
    Op("q_hash_split", hashSplit, Some(hashSplitSql)),
    Op("q_stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    Op("q_shuffle_order", shuffleOrder, Some(shuffleOrderSql)),
    Op("q_seq_pack", seqPack, Some(seqPackSql)))
}
