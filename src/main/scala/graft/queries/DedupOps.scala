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
    md5(trim(regexp_replace(lower(text), "\\W+", " ")))

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

  val dedupKeepFirstSql: String =
    s"""SELECT $fingerprintSql AS fp, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
       |FROM documents
       |GROUP BY fp
       |ORDER BY fp""".stripMargin

  // ---------------------------------------------------------------------
  // MinHash signatures: 4 hash functions (md5 seeded by index) over
  // distinct word-3-gram shingles; 2 bands × 2 rows. All inside
  // codegen via higher-order functions — no UDF, no shuffle until the
  // band groupBy.
  private def minhash(i: Int, sh: Column): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$i|"), s))))

  private def withBands(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = array_distinct(
      Transforms.shingles(Transforms.tokens(col("text")), 3))
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), sh.as("sh"))
      .filter(size(col("sh")) > 0)
      .select(
        col("doc_id"),
        concat(minhash(0, col("sh")), minhash(1, col("sh"))).as("band0"),
        concat(minhash(2, col("sh")), minhash(3, col("sh"))).as("band1"))
      .select(col("doc_id"), explode(array(
        struct(lit(0).as("band_idx"), col("band0").as("band")),
        struct(lit(1).as("band_idx"), col("band1").as("band"))))
        .as("b"))
      .select(col("doc_id"), col("b.band_idx").as("band_idx"),
        col("b.band").as("band"))
  }

  private val bandsCte: String =
    """docs AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(0, greatest(len(toks) - 2, 0)),
      |      j -> array_to_string(toks[j+1:j+3], ' '))) AS sh
      |  FROM (
      |    SELECT doc_id,
      |      list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '') AS toks
      |    FROM documents)
      |), mh AS (
      |  SELECT doc_id,
      |    list_aggregate(list_transform(sh, s -> md5('0|' || s)), 'min') AS h0,
      |    list_aggregate(list_transform(sh, s -> md5('1|' || s)), 'min') AS h1,
      |    list_aggregate(list_transform(sh, s -> md5('2|' || s)), 'min') AS h2,
      |    list_aggregate(list_transform(sh, s -> md5('3|' || s)), 'min') AS h3
      |  FROM docs WHERE len(sh) > 0
      |), bands AS (
      |  SELECT doc_id, 0 AS band_idx, h0 || h1 AS band FROM mh
      |  UNION ALL
      |  SELECT doc_id, 1 AS band_idx, h2 || h3 AS band FROM mh
      |)""".stripMargin

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
       |SELECT band_idx, COUNT(*) AS n_buckets, SUM(n) AS n_docs, MAX(n) AS max_bucket
       |FROM buckets GROUP BY band_idx
       |ORDER BY band_idx""".stripMargin

  // q_near_dup_pairs — LSH candidate pairs: docs sharing any band
  // (equi-join on the band key; quadratic only within buckets).
  def nearDupPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val bands = withBands(spark, sfDir)
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

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
  def jaccardBlocked(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        (col("n_chars") / lit(100)).cast("long").as("len_bucket"),
        array_distinct(Transforms.tokens(col("text"))).as("toks"))
    val a = docs.as("a")
    val b = docs.as("b")
    a.join(b,
        col("a.source") === col("b.source") &&
          col("a.lang") === col("b.lang") &&
          col("a.len_bucket") === col("b.len_bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.source").as("source"),
        (size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
          size(array_union(col("a.toks"), col("b.toks"))).cast("double"))
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
      |  SUM(CASE WHEN jaccard > 0.5 THEN 1 ELSE 0 END) AS n_similar,
      |  MAX(jaccard) AS max_jaccard
      |FROM pairs GROUP BY source
      |ORDER BY source""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("q_dedup_exact", dedupExact, Some(dedupExactSql)),
    Op("q_dedup_keep_first", dedupKeepFirst, Some(dedupKeepFirstSql)),
    Op("q_minhash_bands", minhashBands, Some(minhashBandsSql)),
    Op("q_near_dup_pairs", nearDupPairs, Some(nearDupPairsSql)),
    Op("q_jaccard_blocked", jaccardBlocked, Some(jaccardBlockedSql)))
}
